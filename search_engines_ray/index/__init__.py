from .varbyte import vb_encode, vb_decode, delta_encode, delta_decode
from .build import build_index, IndexBuildConfig
from .reader import IndexReader, Posting
from .merge import merge_indexes, compact_index, delete_docs

__all__ = [
    "vb_encode", "vb_decode", "delta_encode", "delta_decode",
    "build_index", "IndexBuildConfig", "IndexReader", "Posting",
    "merge_indexes", "compact_index", "delete_docs",
]
