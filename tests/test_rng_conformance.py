"""C5/C6 parity: ``basic_dist`` (glibc std::rand) and ``vec_dist``
(libstdc++ std::random_shuffle table) reproduced bit-exactly.

Reference: ``src/frand.h:26-50``. The arbiters here are the REAL
toolchain pieces the reference builds against on its gcc/Linux target:
the host libc's ``rand()`` via ctypes, and ``std::random_shuffle``
compiled from source with ``-std=c++14`` (the call was removed in
C++17).
"""

import ctypes
import shutil
import subprocess

import numpy as np
import pytest

from spath_tpu.ops.rng import GlibcRand, TableRng, vec_dist_table


def _libc():
    try:
        return ctypes.CDLL("libc.so.6")
    except OSError:  # pragma: no cover - non-glibc host
        return None


@pytest.mark.parametrize("seed", [1, 2, 12345, 0, 2**31 + 7, 2**32 - 1])
def test_glibc_rand_bit_exact_vs_libc(seed):
    """GlibcRand reproduces the host libc's rand() draw-for-draw
    (including srand(0) == srand(1) and negative-int32 seeds)."""
    libc = _libc()
    if libc is None:
        pytest.skip("no glibc on this host")
    libc.srand(ctypes.c_uint(seed))
    ref = [libc.rand() for _ in range(2000)]
    g = GlibcRand(seed)
    assert [g.rand() for _ in range(2000)] == ref


def test_basic_dist_draw_normalization():
    """basic_dist = 1.0*rand()/RAND_MAX in double (src/frand.h:28)."""
    g1, g2 = GlibcRand(1), GlibcRand(1)
    for _ in range(100):
        assert g1() == g2.rand() / 2147483647.0


VD_ORACLE = r"""
// Test oracle: evenly spaced table + std::random_shuffle, the
// construction vec_dist performs (evenly spaced step*i values plus a
// trailing 1.0, shuffled once).
#include <vector>
#include <algorithm>
#include <cstdlib>
#include <cstdio>
int main(int argc, char** argv) {
  int n = atoi(argv[1]);
  std::srand(atoi(argv[2]));
  std::vector<double> v;
  double step = 1.0 / n;
  for (int i = 0; i < n; ++i) v.push_back(step * i);
  v.push_back(1.0);
  std::random_shuffle(v.begin(), v.end());
  for (double x : v) printf("%.17g\n", x);
  return 0;
}
"""


@pytest.fixture(scope="module")
def vd_oracle(tmp_path_factory):
    gxx = shutil.which("g++")
    if gxx is None:
        pytest.skip("no g++ on this host")
    d = tmp_path_factory.mktemp("vd_oracle")
    src = d / "vd.cpp"
    src.write_text(VD_ORACLE)
    exe = d / "vd"
    r = subprocess.run(
        [gxx, "-std=c++14", "-O1", "-o", str(exe), str(src)],
        capture_output=True, text=True,
    )
    if r.returncode != 0:  # pragma: no cover - toolchain quirk
        pytest.skip(f"c++14 oracle failed to build: {r.stderr[:200]}")
    return exe


@pytest.mark.parametrize("n,seed", [(10, 1), (100, 1), (1000, 1),
                                    (64, 7), (1000, 12345)])
def test_vec_dist_table_bit_exact_vs_cpp(vd_oracle, n, seed):
    """vec_dist_table == the table std::random_shuffle actually builds
    on this toolchain (forward Fisher-Yates over std::rand()%(i+1))."""
    ref = np.array([
        float(x) for x in subprocess.run(
            [str(vd_oracle), str(n), str(seed)],
            capture_output=True, text=True, check=True,
        ).stdout.split()
    ])
    assert np.array_equal(vec_dist_table(n, GlibcRand(seed)), ref)


def test_table_rng_exact_permutation():
    """TableRng (exact mode) cycles the bit-exact vec_dist table."""
    t = vec_dist_table(10)
    r = TableRng(10)
    assert [r() for _ in range(11)] == list(t)
    assert [r() for _ in range(11)] == list(t)   # cycles


def test_sequential_basic_render_matches_native():
    """The sequential oracle renderer drawing from GlibcRand matches the
    native C++ golden that consumes real std::rand() — same walk order,
    same float32 recursion (src/cpu_renderer.cpp:105-116). Trig is
    numpy vs libm (1-ulp differences), so assert to 1 ulp and u8."""
    from spath_tpu.scene import default_scene
    from spath_tpu.utils import native, oracle

    if not native.native_available():
        pytest.skip("native library unavailable")
    sc = default_scene()
    v = np.stack([np.asarray(sc.v0), np.asarray(sc.v1),
                  np.asarray(sc.v2)], 1)
    alb, emi = np.asarray(sc.albedo), np.asarray(sc.emission)
    ref = native.native_render_pt_basic(16, 12, v, alb, emi, spp=2)
    mine = oracle.render_pt_basic(16, 12, v, alb, emi, spp=2,
                                  rng=GlibcRand(1))
    assert np.allclose(ref, mine, atol=2e-7)
    u8 = lambda x: (np.clip(x, 0, 1) * 255.0 + 0.5).astype(np.uint8)
    assert int(np.abs(u8(ref).astype(int) - u8(mine).astype(int)).max()) <= 1


def test_device_table_mode_semantics():
    """Device 'table' RNG: pixel p's k-th draw is
    table[(p + seed + k) % len] in (sample, bounce, draw) walk order."""
    import jax.numpy as jnp

    from spath_tpu.ops.rng import device_table, table_uniforms

    table = jnp.asarray(device_table(50))
    n = np.asarray(table).shape[0]
    pix = jnp.arange(7, dtype=jnp.uint32)
    us = np.asarray(table_uniforms(table, pix, sample=1, bounce=2,
                                   n_draws=2, max_bounces=5, offset=3))
    tab = np.asarray(table)
    k0 = (1 * 5 + 2) * 2
    for d in range(2):
        for p in range(7):
            assert us[d, p] == tab[(p + 3 + k0 + d) % n]


def test_device_table_mode_renders():
    """rng='table' renders through the wavefront, deterministically."""
    from spath_tpu.camera import Camera
    from spath_tpu.config import RenderConfig
    from spath_tpu.models.pathtracer import render_pt
    from spath_tpu.scene import default_scene

    cfg = RenderConfig(width=24, height=16, spp=2, rng="table",
                       sampler="angle", table_size=100,
                       intersect="pluecker")
    sc, cam = default_scene(), Camera.default()
    a = np.asarray(render_pt(sc, cam, cfg, seed=0))
    b = np.asarray(render_pt(sc, cam, cfg, seed=0))
    c = np.asarray(render_pt(sc, cam, cfg, seed=9))
    assert np.isfinite(a).all()
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)          # seed shifts the cursor
    assert a.std() > 0                        # non-degenerate image
