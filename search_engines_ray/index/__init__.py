from .varbyte import vb_encode, vb_decode, delta_encode, delta_decode
from .build import build_index, IndexBuildConfig
from .reader import IndexReader, Posting

__all__ = [
    "vb_encode", "vb_decode", "delta_encode", "delta_decode",
    "build_index", "IndexBuildConfig", "IndexReader", "Posting",
]
