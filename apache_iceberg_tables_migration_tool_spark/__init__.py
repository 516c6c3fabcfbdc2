"""PySpark-native analytics + table-migration engine.

A ground-up, Spark-first re-expression of the capability surface of
``aws-samples/apache-iceberg-tables-migration-tool`` (six PySpark CLI
scripts doing point-in-time Iceberg table migration: snapshot
collection, as-of resolution, schema round-trip DDL, data copy, and
integrity verification), extended with large-scale training-data
pipeline operators (dedup, similarity search, text analysis,
multimodal column plumbing, event windows).

Everything is expressed against the DataFrame/SQL API so Catalyst +
Tungsten pick the physical plan; no RDDs, no custom rules. The
snapshot/time-travel substrate is a self-contained Parquet snapshot
catalog (``sources.snapcat``) because no Iceberg runtime jar ships in
this environment — the engine semantics (snapshots, time travel,
metadata tables, maintenance) mirror the Iceberg model the reference
drives.
"""

__version__ = "0.1.0"
