"""PySpark-native CDC engine with the capabilities of
debezium/debezium-connector-vitess (reference, read-only at /root/reference).

Brand-new Spark-first implementation — NOT a Java port. The reference is a
Kafka Connect source connector that decodes Vitess VStream gRPC binlog events
into Debezium-envelope change records. Here the same surface is expressed as:

- a custom PySpark Structured Streaming data source (``sources/``) whose
  offsets are VGTID JSON documents and whose input partitions are shards;
- stateless Catalyst-native decode / projection / filter transforms
  (``decode.py``, ``filters.py``, ``transforms.py``);
- one stateful operator for ordered-transaction metadata (epoch/rank,
  ``txmeta/``);
- sink shaping: topic routing, CloudEvents, heartbeats (``sinks.py``);
- LLM-data-pipeline extension operators designed for 100 TB scale
  (``ops/``: dedup, similarity search, text analysis, multimodal columns).
"""

__version__ = "0.1.0"

CONNECTOR_NAME = "vitess"
