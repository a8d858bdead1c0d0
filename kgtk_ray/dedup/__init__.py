from .exact import dedup_exact
from .minhash import minhash_dedup, minhash_signatures
from .simhash import simhash_dedup, simhash64
from .ngram import ngram_jaccard_dedup
from .embed import embedding_dedup
from .semdedup import semdedup
from .against import dedup_against

__all__ = [
    "dedup_exact", "minhash_dedup", "minhash_signatures",
    "simhash_dedup", "simhash64", "ngram_jaccard_dedup", "embedding_dedup",
    "semdedup", "dedup_against",
]
