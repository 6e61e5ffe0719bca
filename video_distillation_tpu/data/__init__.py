from .meta import (FRAME_GAP, NUM_FRAMES, DatasetMeta, get_meta,
                   register_meta)
from .packer import pack_dataset
from .store import (ClipStore, RaggedFrameStore, VideoData, clip_indices,
                    load_packed, sample_start, save_packed)
from .synthetic import make_synthetic_video_data

__all__ = [
    "FRAME_GAP", "NUM_FRAMES", "DatasetMeta", "get_meta", "register_meta",
    "pack_dataset", "ClipStore", "RaggedFrameStore", "VideoData",
    "clip_indices", "load_packed", "sample_start", "save_packed",
    "make_synthetic_video_data",
]
