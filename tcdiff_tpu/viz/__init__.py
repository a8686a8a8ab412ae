from tcdiff_tpu.viz.render import skeleton_render
from tcdiff_tpu.viz.postprocess import render_sample, stitch_long, split_sample

__all__ = ["skeleton_render", "render_sample", "stitch_long", "split_sample"]
