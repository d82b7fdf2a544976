from .wavefront import render, render_accumulate, sky_background, trace_sample

__all__ = ["render", "render_accumulate", "sky_background", "trace_sample"]
