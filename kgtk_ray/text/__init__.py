from .langid import langid
from .quality import quality_score
from .tokens import token_counts
from .fingerprint import fingerprint, winnowing_fingerprints
from .normalize import (
    normalize_text,
    normalize_text_series,
    normalize_whitespace_series,
    normalize_punctuation_series,
)
from .repetition import (
    repetition_signals,
    gopher_filter,
    corpus_dup_ngram_frac,
)
from .pii import scrub_pii, scrub_series
from .chunk import chunk_text
from .decontam import decontaminate
from .lm import unigram_logprob
from .pack import pack_sequences
from .spans import dedup_spans
from .classifier import (
    classifier_filter,
    quality_classifier_scores,
    train_quality_classifier,
)
from .dsir import dsir_scores, dsir_sample
from .lines import c4_line_filter
from .urls import (
    canonicalize_urls,
    canonicalize_series,
    dedup_urls,
    filter_domains,
    extract_host,
)

__all__ = ["langid", "quality_score", "token_counts", "fingerprint",
           "winnowing_fingerprints", "normalize_text", "normalize_text_series",
           "normalize_whitespace_series", "normalize_punctuation_series",
           "repetition_signals", "gopher_filter", "corpus_dup_ngram_frac",
           "scrub_pii", "scrub_series", "chunk_text", "decontaminate", "unigram_logprob",
           "pack_sequences", "dedup_spans", "canonicalize_urls",
           "canonicalize_series", "dedup_urls", "filter_domains",
           "extract_host", "dsir_scores", "dsir_sample", "quality_classifier_scores",
           "classifier_filter", "train_quality_classifier", "c4_line_filter"]
