from .langid import langid
from .quality import quality_score
from .tokens import token_counts
from .fingerprint import fingerprint, winnowing_fingerprints

__all__ = ["langid", "quality_score", "token_counts", "fingerprint",
           "winnowing_fingerprints"]
