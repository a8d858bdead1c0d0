"""kgtk_ray — a Ray-Data-native knowledge-graph construction and data
processing engine with the query/data-processing capabilities of KGTK
(reference: shashank73744/kgtk, studied at /root/reference).

This is a from-scratch implementation: every operator is a function
``ray.data.Dataset -> ray.data.Dataset`` built on ``map_batches`` over
zero-copy Arrow batches, explicit ``groupby`` shuffles for the wide
steps, and actor pools for stateful stages (entity linkers, embedders).
Nothing here translates the reference's row-at-a-time TSV engine.

Layout:
  format.py      KGTK file-format constants, escaping, | -list handling
  values.py      vectorized KGTK value classify / validate / repair / explode
  io/            KGTK TSV <-> Arrow readers and writers, parquet helpers
  ops/           relational + KGTK operators (filter, compact, lift, join, ...)
  dedup/         exact + near-duplicate detection (minhash-LSH, simhash, ...)
  text/          language-id, quality scoring, tokenization, fingerprints
  ann.py         brute-force + LSH-bucketed cosine similarity search
  multimodal.py  binary-column (image/audio) stage plumbing (decode stubbed)
  pipelines/     web-page corpus -> extract -> triples -> link -> canonicalize
"""

__version__ = "0.1.0"
