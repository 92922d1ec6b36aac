from .builder import FilterEngine, compile_index
from .compiled import CompiledIndex, DocBatch, batch_from_docs

__all__ = ["CompiledIndex", "DocBatch", "FilterEngine", "batch_from_docs", "compile_index"]
