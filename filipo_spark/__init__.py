"""filipo_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of
``dbis-trier-university/FiLiPo`` (reference at /root/reference, Java 11)
as an idiomatic Spark engine:

* binlog/WAL-shaped change streams of conversation-transcript mutations
  (insert/update/delete keyed by ``(conv_id, turn_idx)``) applied as
  idempotent MERGE-style upserts into a partitioned, Iceberg-shaped
  snapshot table (``filipo_spark.table``);
* last-writer-wins dedup via map-side-combinable ``max_by`` aggregation
  (skew-safe without explicit salting; two-phase salted variant provided);
* exactly-once via epoch-fenced offsets + an idempotent commit manifest
  (``filipo_spark.replay``) — the Spark-native version of the reference's
  delete-then-insert function store (OutputManager.java:65-303);
* FiLiPo's KB↔API schema-alignment core (AlignmentProcessor.java) rebuilt
  as a vectorized schema-evolution mapper (``filipo_spark.align``);
* training-data-pipeline operators: dedup (exact/MinHash/SimHash/n-gram
  Jaccard/embedding-cosine), ANN similarity search, text analysis
  (``filipo_spark.operators``, ``filipo_spark.functions``).

Everything is DataFrame-first: no RDDs, no per-row Python UDFs; Python
reaches executors only through Arrow-vectorized pandas UDFs.
"""

__version__ = "0.1.0"

TARGET_KEY = ("conv_id", "turn_idx")
