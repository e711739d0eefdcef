"""PySpark-native CDC / incremental-ingest engine.

A from-scratch re-imagining of clinical-data-mining/cdm-cbioportal-etl
(single-node pandas batch ETL) as a distributed, Spark-first engine:

- ``lake``       : copy-on-write snapshot table format on parquet
                   (Iceberg-style semantics: atomic commits, bucket pruning,
                   MERGE INTO, schema evolution) — on a real cluster this
                   layer is swappable for Apache Iceberg.
- ``cdc``        : WAL/binlog-tail replay — exactly-once apply via an
                   LSN ledger, latest-wins upsert, per-partition
                   checkpoint/lineage, resumability.
- ``operators``  : the reference pipeline's transform semantics
                   (anchor-date derivation, date→interval deid, template
                   join + backfill, horizontal widen, presence pivot,
                   melt, header construction) as DataFrame plans.
- ``functions``  : scalar column-expression helpers (zero-pad, tolerant
                   date parse, HIPAA clamping, readable intervals).
- ``text``       : large-scale training-data ops — dedup (exact, MinHash
                   LSH, n-gram Jaccard), language ID, quality scoring,
                   token counting, fingerprinting.
- ``similarity`` : embedding similarity search (brute-force cosine top-k,
                   LSH-bucketed ANN).
- ``streaming``  : Structured Streaming front-end for the CDC apply loop.
- ``plans``      : benchmark / correctness query catalog.
"""

__version__ = "0.1.0"
