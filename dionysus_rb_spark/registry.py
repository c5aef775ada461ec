"""Declarative registry — the engine's equivalent of the reference's
``Dionysus::Producer.declare`` / ``Dionysus::Consumer.declare`` DSL
(lib/dionysus/producer/registry.rb, lib/dionysus/consumer/registry.rb).

The Ruby gem instance_evals declaration blocks and metaprograms one
responder class per topic (karafka_responder_generator.rb:8-126) and one
consumer class per topic (karafka_consumer_generator.rb:6-55). Here the
same declarations are plain dataclasses, and "code generation" is plan
construction: each topic compiles to

* producer side: a ``respond(parent_df, children…) -> (key, value)``
  DataFrame transform (P1-P7 + partition key + envelope), plus the
  reverse lookups powering derived publishing — dependency→parent
  fan-out (J2, producer.rb:56-75) and observer matching (J3,
  registry.rb:95-161 / producer.rb:101-120);
* consumer side: a deserializer config + per-topic batch
  transformation + message filters feeding persist_batch
  (consumer/registry.rb:35-81).

Topic naming: ``{namespace}_{name}`` (topic_name.rb:12-14); genesis
replica twin ``{name}_genesis`` when declared (registry.rb:63-76).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .consumer.deserializer import DeserializerConfig
from .functions.inflect import classify
from .producer.serializer import ChildRel, serialize_aggregate
from .sources.envelope import encode_envelope

KeyFn = Callable[[DataFrame], Column]


def topic_name(name: str, namespace: str = "dionysus") -> str:
    return f"{namespace}_{name}"


@dataclass
class ObserverDecl:
    """``observe: [{model:, attributes:, association_name:}]``
    (registry.rb:95-161): when ``model`` changes any of ``attributes``,
    republish the records reached via ``association_name`` (a column on
    the observed model holding the associated id, possibly a dotted
    multi-hop chain)."""

    model: str
    attributes: tuple[str, ...]
    association_name: str  # FK column chain, e.g. "rental_id" or "booking.rental_id"


@dataclass
class PublicationDecl:
    """``publish Resource, with: [Child…], observe: […]``
    (registry.rb:78-80 + responder options)."""

    resource: str  # entity name, e.g. "rental"
    id_col: str = "id"
    attributes: tuple[str, ...] = ()
    to_one_links: dict[str, str] = field(default_factory=dict)
    has_many: dict[str, ChildRel] = field(default_factory=dict)  # sideloads (with:)
    observes: tuple[ObserverDecl, ...] = ()
    serialize: bool = True  # False = P6 bypass


@dataclass
class TopicDecl:
    name: str
    namespace: str = "dionysus"
    genesis_replica: bool = False
    partition_key: str | KeyFn | None = None  # default account_id (config.rb:33-35)
    publications: list[PublicationDecl] = field(default_factory=list)

    @property
    def primary(self) -> str:
        return topic_name(self.name, self.namespace)

    @property
    def genesis(self) -> str | None:
        return topic_name(f"{self.name}_genesis", self.namespace) if self.genesis_replica else None


class ProducerRegistry:
    def __init__(self, namespace: str = "dionysus", default_partition_key: str = "account_id"):
        self.namespace = namespace
        self.default_partition_key = default_partition_key
        self.topics: dict[str, TopicDecl] = {}

    def topic(
        self,
        name: str,
        genesis_replica: bool = False,
        partition_key: str | KeyFn | None = None,
    ) -> TopicDecl:
        decl = TopicDecl(
            name,
            self.namespace,
            genesis_replica,
            partition_key,
        )
        self.topics[name] = decl
        return decl

    def publish(self, topic: str, pub: PublicationDecl) -> PublicationDecl:
        self.topics[topic].publications.append(pub)
        return pub

    # -- reverse lookups (derived publishing) --------------------------------

    def topics_for_resource(self, resource: str) -> list[TopicDecl]:
        """Primary topics of a resource (producer.rb:42-54)."""
        return [t for t in self.topics.values() for p in t.publications if p.resource == resource]

    def parents_of_dependency(self, child_resource: str) -> list[tuple[TopicDecl, PublicationDecl, ChildRel]]:
        """J2 reverse lookup (producer.rb:56-75): publications sideloading
        ``child_resource`` — a change to the child republishes these
        parents as ``{parent}_updated``."""
        from .functions.inflect import singularize

        out = []
        for t in self.topics.values():
            for p in t.publications:
                for rel_name, rel in p.has_many.items():
                    if (rel.entity or singularize(rel_name)) == child_resource:
                        out.append((t, p, rel))
        return out

    def observers_for(self, model: str, changed_cols: set[str]) -> list[tuple[TopicDecl, PublicationDecl, ObserverDecl]]:
        """J3 match (registry.rb:95-161): observer declarations watching
        any of ``changed_cols`` on ``model``."""
        out = []
        for t in self.topics.values():
            for p in t.publications:
                for ob in p.observes:
                    if ob.model == model and changed_cols & set(ob.attributes):
                        out.append((t, p, ob))
        return out

    # -- compiled pipelines --------------------------------------------------

    def partition_key_col(self, topic: str, df: DataFrame) -> Column:
        """partition_key.rb:12-41: attribute name or lambda of the
        resource frame; integer keys normalize through a string cast
        (partition_key.rb:39 ``to_i.to_s``).

        Deliberate deviation from partition_key_spec.rb's "resource
        does not respond to that key -> nil": a misdeclared attribute
        here fails at ANALYSIS time (F.col on a missing column) instead
        of silently null-keying the whole topic. Per-record nil is
        tolerable row-at-a-time; set-oriented, it would strip ordering
        from every record of the publication in one batch."""
        pk = self.topics[topic].partition_key or self.default_partition_key
        col = pk(df) if callable(pk) else F.col(pk)
        return col.cast("string")

    def responder(self, topic: str, resource: str) -> Callable[..., DataFrame]:
        """Compile ``respond(action, parent_df) -> (key, partition_key,
        value)`` for one publication (karafka_responder_generator.rb:
        16-68). ``action`` ∈ created/updated/destroyed."""
        decl = self.topics[topic]
        pub = next(p for p in decl.publications if p.resource == resource)
        model = classify(resource)

        def respond(
            action: str, parent: DataFrame, keep_cols: tuple[str, ...] = ()
        ) -> DataFrame:
            if pub.serialize:
                with_payload = serialize_aggregate(
                    parent,
                    parent_id=pub.id_col,
                    attributes=list(pub.attributes),
                    to_one_links=pub.to_one_links,
                    has_many=pub.has_many,
                )
            else:  # P6 bypass: raw projection
                with_payload = parent.withColumn(
                    "payload", F.struct(F.col(pub.id_col).alias("id"))
                )
            pk = self.partition_key_col(topic, parent)
            return encode_envelope(
                with_payload.withColumn("__pk", pk),
                event=F.lit(f"{resource}_{action}"),
                model_name=F.lit(model),
                data=F.array(F.col("payload")),
                key=F.concat(F.lit(model + ":"), F.col(pub.id_col).cast("string")),
                keep_cols=("__pk", *keep_cols),
            ).withColumnRenamed("__pk", "partition_key")

        return respond

    def resolve_association_chain(
        self,
        start: DataFrame,
        hops: list[tuple[DataFrame, str, str]],
        broadcast_hops: bool = False,
    ) -> DataFrame:
        """J3's dotted ``association_name`` chains (producer.rb:101-120:
        ``booking.rental`` walks two associations): each hop is
        ``(table, left_col, right_col)`` joined left-to-right.

        Hops shuffle-join by default and AQE broadcasts them at runtime
        when they turn out small — the API accepts arbitrary tables, so
        a forced hint is only safe when the CALLER knows every hop is
        bounded by construction (a true dimension table); pass
        ``broadcast_hops=True`` for that case. (Round-6 flip: the old
        default-True was the last API whose default forced a broadcast
        of a caller-supplied, not-provably-bounded table — the same
        usually-small-is-not-bounded pattern the r4/r5 audit removed
        everywhere else. PLANS.md "Forced-broadcast audit".)"""
        cur = start
        for i, (tbl, lcol, rcol) in enumerate(hops):
            left_alias, right_alias = f"__l{i}", f"__hop{i}"
            right = tbl.alias(right_alias)
            if broadcast_hops:
                right = F.broadcast(right)
            cur = (
                cur.alias(left_alias)
                .join(
                    right,
                    F.col(f"{left_alias}.{lcol}") == F.col(f"{right_alias}.{rcol}"),
                )
                .drop(F.col(f"{right_alias}.{rcol}"))
            )
        return cur

    def dependency_parent_events(
        self, child_resource: str, changed_child_keys: DataFrame, parent_tables: dict[str, DataFrame]
    ) -> list[tuple[str, DataFrame]]:
        """J2 fan-out (outbox/publisher.rb:80-105): join changed-child FK
        keys to each declared parent, emitting ``{parent}_updated`` key
        frames per topic. The child-key side is the small one —
        broadcast it."""
        out = []
        for t, p, rel in self.parents_of_dependency(child_resource):
            parent = parent_tables[p.resource]
            keys = changed_child_keys.select(F.col(rel.fk).alias("__fk")).distinct()
            hit = parent.join(
                F.broadcast(keys), parent[p.id_col] == F.col("__fk")
            ).drop("__fk")
            out.append((t.primary, hit.withColumn("event", F.lit(f"{p.resource}_updated"))))
        return out


@dataclass
class ConsumerTopicDecl:
    """``topic :x { dionysus_model … }`` with consumer options
    (consumer/registry.rb:62-81)."""

    name: str
    entity: str
    schema: StructType
    namespace: str = "dionysus"
    import_mode: bool = False  # S8 bulk import path
    deserializer_cfg: DeserializerConfig = field(default_factory=DeserializerConfig)
    polymorphic_types: dict[str, list[str]] = field(default_factory=dict)
    # A1 dedup by default, like the reference's default
    # params_batch_transformation (consumer/registry.rb:78-81)
    batch_transformation: Callable[[DataFrame], DataFrame] | None = None
    message_filters: tuple[Callable[[DataFrame], Column], ...] = ()

    @property
    def topic(self) -> str:
        return topic_name(self.name, self.namespace)


class ConsumerRegistry:
    def __init__(self, namespace: str = "dionysus"):
        self.namespace = namespace
        self.topics: dict[str, ConsumerTopicDecl] = {}

    def topic(self, decl: ConsumerTopicDecl) -> ConsumerTopicDecl:
        decl.namespace = self.namespace
        self.topics[decl.name] = decl
        return decl

    def apply_message_filters(self, decl_name: str, df: DataFrame) -> tuple[DataFrame, DataFrame]:
        """F4: (kept, ignored) — ignored rows feed the dead-letter path
        (default_message_filter.rb:11-17)."""
        decl = self.topics[decl_name]
        keep = F.lit(True)
        for flt in decl.message_filters:
            keep = keep & ~flt(df)
        return df.filter(keep), df.filter(~keep)
