from rdm_tpu.retrieval.engine import RetrievalEngine, knn_search
from rdm_tpu.retrieval.database import DataPool, NNMemory

__all__ = ["RetrievalEngine", "knn_search", "DataPool", "NNMemory"]
