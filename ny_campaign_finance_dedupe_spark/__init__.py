"""PySpark-native entity-resolution engine.

A from-scratch rebuild of the capabilities of
rawild/ny-campaign-finance-dedupe (blocking -> pairwise scoring ->
transitive clustering) re-expressed Spark-first over web-page-shaped
input ``pages(url, warc_ts, html, text, lang)``, plus the
training-data-pipeline operators (dedup family, similarity search,
text analysis) that the same engine needs at 100 TB scale.

Nothing here is a port: the reference's Postgres + multiprocessing +
memmap topology collapses into a single declarative DataFrame plan
(see SURVEY.md section 3.1 for the mapping).
"""

__version__ = "0.1.0"
