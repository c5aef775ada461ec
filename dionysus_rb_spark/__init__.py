"""dionysus_rb_spark — a PySpark-native engine with the data-processing
capabilities of BookingSync/dionysus-rb (domain-level CDC over Kafka),
rebuilt Spark-first on the DataFrame API + Structured Streaming.

The reference (studied at /root/reference, cited as ``file:line`` in
docstrings throughout) is a Ruby CDC framework: producers capture
create/update/delete events, serialize aggregate snapshots, publish via a
transactional outbox to Kafka; consumers deserialize, dedup, and
idempotently upsert with stale-data guards and soft-delete semantics.

This package re-expresses every operator in that pipeline as declarative
DataFrame transforms so Catalyst/Tungsten (and AQE at cluster scale) pick
the physical plan, plus the large-scale training-data operators
(dedup / similarity search / text analysis / multimodal plumbing) that a
100 TB pipeline needs.

Layout:
    session.py     tuned SparkSession builder
    tables.py      testdata loaders (nanos-timestamp handling)
    registry.py    declarative producer/consumer topic registry (the DSL)
    operators/     dedup, merge/upsert, outbox, event classification,
                   joins, metrics, similarity, text ops, multimodal
    sources/       envelope codec (wire format), kafka + file wiring
    consumer/      deserializer (canonical flatten), persistor pipeline
    producer/      serializer (aggregate assembly), genesis backfill
    streaming/     Structured Streaming wiring of the same transforms
    plans/         the query catalog backing __spark_entry__.py
"""

__version__ = "0.1.0"

# public API surface (lazy submodule access keeps import cost minimal)
from .registry import (  # noqa: E402,F401
    ConsumerRegistry,
    ConsumerTopicDecl,
    ObserverDecl,
    ProducerRegistry,
    PublicationDecl,
)
from .session import get_spark  # noqa: E402,F401
from .tables import load_table, register_views  # noqa: E402,F401
