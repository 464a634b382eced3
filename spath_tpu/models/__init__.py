"""Renderer models: flat debug, wavefront path tracer, inverse rendering."""

from spath_tpu.models.flat import render_flat
from spath_tpu.models.pathtracer import render_pt, trace_radiance

__all__ = ["render_flat", "render_pt", "trace_radiance"]
