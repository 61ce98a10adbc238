"""osm2orc_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of mojodna/osm2orc, extended with
large-scale training-data-pipeline operators.

Layout:
  schemas      — fixed StructType schemas (planet / planet_history / changesets)
                 mirroring the reference ORC TypeDescriptions
                 (reference: standalone/OsmPbf2Orc.java:58-82,
                  standalone/OsmChangesetXml2Orc.java:42-58)
  sources      — PBF + changeset-XML readers returning DataFrames
  sinks        — ORC writer with reference-equivalent options + user metadata
  transforms   — reference row-level cell semantics as column expressions
  queries      — the relational operator corpus (SURVEY.md §2C) + README corpus
  operators    — dedup / similarity / text-analysis / multimodal operators
  streaming    — Structured Streaming over the events table
  registry     — central query registry consumed by __spark_entry__.py
"""

__version__ = "0.1.0"
