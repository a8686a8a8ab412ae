from tcdiff_tpu.export.bvh import pkl_to_bvh, write_bvh
from tcdiff_tpu.export.fbx_export import SmplObjects, fbx_available, pkl_to_fbx
from tcdiff_tpu.export.split_pkl import split_pkl_file

__all__ = [
    "pkl_to_bvh",
    "write_bvh",
    "SmplObjects",
    "fbx_available",
    "pkl_to_fbx",
    "split_pkl_file",
]
