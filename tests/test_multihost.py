"""Real 2-process multi-host smoke test (SURVEY §5 "distributed
communication backend"; BASELINE config 5 machinery).

Spawns two OS processes that ``jax.distributed.initialize`` against a
local coordinator (gloo CPU collectives), build ONE mesh spanning both
processes' devices, and run the sharded renderer — validating the
actual multi-host code path (``parallel.multihost.init_multihost`` +
``parallel.shard``) that a pod slice would use, not just the fake
single-process 8-device mesh.
"""

import socket
import subprocess
import sys
import textwrap

import numpy as np

_WORKER = textwrap.dedent('''
    import os, sys
    pid = int(sys.argv[1]); port = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    from spath_tpu.parallel.multihost import init_multihost
    init_multihost(f"localhost:{port}", 2, pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()
    # double-init must be a harmless no-op (RuntimeError swallowed)
    init_multihost(f"localhost:{port}", 2, pid)

    import jax.numpy as jnp
    from spath_tpu.camera import Camera
    from spath_tpu.config import RenderConfig
    from spath_tpu.parallel.mesh import make_mesh
    from spath_tpu.parallel.shard import render_pt_sharded
    from tests.test_nee import _wall_and_light_scene

    # Silhouette-free scene: no grazing path can flip between the
    # distributed and single-process compilations.
    cfg = RenderConfig(width=32, height=16, spp=2, max_bounces=3)
    img = render_pt_sharded(_wall_and_light_scene(), Camera.default(),
                            cfg, 0, make_mesh())
    # Replicated scalars summarizing the distributed image.
    s, s2 = jax.jit(lambda x: (jnp.sum(x), jnp.sum(x * x)))(img)
    print(f"WORKER_OK {pid} {float(s):.6f} {float(s2):.6f}")
''')


def test_two_process_multihost_render():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out[-2000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("WORKER_OK")]
        assert line, f"no WORKER_OK in:\n{out[-2000:]}"
        outs.append(line[0].split())

    # Both processes computed the same replicated image summary...
    assert outs[0][2:] == outs[1][2:], outs

    # ...matching the single-process render to float32 noise.
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from spath_tpu.camera import Camera
    from spath_tpu.config import RenderConfig
    from spath_tpu.models.pathtracer import render_pt
    from tests.test_nee import _wall_and_light_scene

    cfg = RenderConfig(width=32, height=16, spp=2, max_bounces=3)
    img = render_pt(_wall_and_light_scene(), Camera.default(), cfg, 0)
    want_s = float(jnp.sum(img))
    got_s = float(outs[0][2])
    np.testing.assert_allclose(got_s, want_s, rtol=1e-4)
