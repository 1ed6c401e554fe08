from .cg import batched_cg
from .chol import jittered_cholesky, cholesky_logdet
from .gram import gram_from_columns

__all__ = ["batched_cg", "jittered_cholesky", "cholesky_logdet", "gram_from_columns"]
