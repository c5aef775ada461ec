"""Producer-side serialization: flat tables -> aggregate payload structs.

Re-expresses lib/dionysus/producer/model_serializer.rb set-wise:

  P1  attribute projection     attributes :a, :b     model_serializer.rb:13-25,63-67
  P2  link (FK) projection     has_one -> links.x = x_id; has_many ->
                               links.y = [ids]        model_serializer.rb:27-49,68-75
  P3  sideload assembly        include'd children serialized inline
                               (recursively)          model_serializer.rb:76-88
  P5  deleted-record projection pk + declared payload on the delete branch
                                                      deleted_record_serializer.rb:4-16
  P6  serialization bypass     serialize: false -> raw as_json (id-only DTOs)
                                                      karafka_responder_generator.rb:72-75

The Ruby code walks records one by one; here each has_many is one
``groupBy(fk).agg(collect_list(struct(...)))`` and the aggregate is one
left join per relationship — at scale, child aggregation shuffles on the
FK once and the parent join is FK-co-located (bucket both sides by the
key in the lakehouse layout to avoid even that).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class ChildRel:
    """A has_many relationship to sideload (P2 ids + P3 inline objects)."""

    child: DataFrame
    fk: str  # column on child referencing parent id
    child_id: str  # child pk column
    attributes: list[str] = field(default_factory=list)  # serialized child cols
    sideload: bool = True  # include inline objects, not just link ids
    order_col: str | None = None  # deterministic sideload order
    entity: str | None = None  # child entity name (registry reverse lookups)


def serialize_aggregate(
    parent: DataFrame,
    parent_id: str,
    attributes: list[str],
    to_one_links: dict[str, str] | None = None,
    has_many: dict[str, ChildRel] | None = None,
    prefilter_children: bool = False,
) -> DataFrame:
    """Build a ``payload`` struct column per parent row: declared
    attributes + ``links`` (to-one ids, to-many id arrays) + sideloaded
    child object arrays. Returns the parent frame with ``payload``.

    ``prefilter_children=True`` semi-joins each child table against the
    parent's key set *before* the groupBy. Catalyst cannot push a parent
    filter through the aggregate-then-join shape, so when the parent is
    selective (a genesis window, an outbox drain batch) the default plan
    shuffles the ENTIRE child table to build groups that the left join
    then discards. The semi-join (broadcast when the parent key set is
    small) prunes children at the scan, so the groupBy shuffle is sized
    by surviving rows — at 100 TB this is the difference between
    shuffling all children and only the touched aggregates. Leave False
    for full-table serialization, where the extra join is pure cost."""
    to_one_links = to_one_links or {}
    has_many = has_many or {}

    df = parent
    parent_keys = (
        parent.select(F.col(parent_id).alias("__pk")) if prefilter_children else None
    )
    link_cols: list[tuple[str, Column]] = [
        (name, F.col(col)) for name, col in to_one_links.items()
    ]
    sideload_cols: list[tuple[str, Column]] = []

    for name, rel in has_many.items():
        if parent_keys is not None:
            rel = ChildRel(
                child=rel.child.join(
                    parent_keys, rel.child[rel.fk] == parent_keys["__pk"], "left_semi"
                ),
                fk=rel.fk,
                child_id=rel.child_id,
                attributes=rel.attributes,
                sideload=rel.sideload,
                order_col=rel.order_col,
                entity=rel.entity,
            )
        struct_cols = [F.col(c) for c in ([rel.child_id] + rel.attributes)]
        obj = F.struct(*struct_cols)
        id_col, obj_col = F.col(rel.child_id), obj
        if rel.order_col and rel.order_col == rel.child_id:
            # order key == the object struct's FIRST field, so sorting
            # the objects directly gives the identical sequence the
            # keyed pair sort would (struct comparison is field-by-
            # field: equal ids fall through to the same attribute
            # tie-break either way) — and the shuffle stops carrying a
            # duplicate copy of the sort key per child row
            # (optimization r13: the sideload aggregate's exchange is
            # the corpus-sized one in this operator).
            sorted_objs = F.array_sort(F.collect_list(obj_col))
            grouped = rel.child.groupBy(rel.fk).agg(sorted_objs.alias("__p"))
            grouped = grouped.select(
                rel.fk,
                F.transform(F.col("__p"), lambda x: x[rel.child_id]).alias(
                    f"__ids_{name}"
                ),
                F.col("__p").alias(f"__objs_{name}"),
            )
        elif rel.order_col:
            # collect under a sort key, then strip it: deterministic arrays
            # independent of task/partition ordering. One collect_list +
            # one array_sort; both the id array and the object array are
            # views over the same sorted buffer, so they're mutually
            # consistent even under order_col ties.
            pair = F.struct(F.col(rel.order_col).alias("__o"), obj_col.alias("o"))
            sorted_pairs = F.array_sort(F.collect_list(pair))
            grouped = rel.child.groupBy(rel.fk).agg(sorted_pairs.alias("__p"))
            grouped = grouped.select(
                rel.fk,
                F.transform(F.col("__p"), lambda x: x["o"][rel.child_id]).alias(
                    f"__ids_{name}"
                ),
                F.transform(F.col("__p"), lambda x: x["o"]).alias(f"__objs_{name}"),
            )
        else:
            grouped = rel.child.groupBy(rel.fk).agg(
                F.collect_list(id_col).alias(f"__ids_{name}"),
                F.collect_list(obj_col).alias(f"__objs_{name}"),
            )
        grouped = grouped.withColumnRenamed(rel.fk, f"__fk_{name}")
        df = df.join(
            grouped, df[parent_id] == grouped[f"__fk_{name}"], "left"
        ).drop(f"__fk_{name}")
        link_cols.append(
            (name, F.coalesce(F.col(f"__ids_{name}"), F.array().cast("array<long>")))
        )
        if rel.sideload:
            sideload_cols.append((name, F.col(f"__objs_{name}")))

    payload_fields: list[Column] = [F.col(parent_id).alias("id")] + [
        F.col(a).alias(a) for a in attributes if a != parent_id
    ]
    if link_cols:
        payload_fields.append(
            F.struct(*[c.alias(n) for n, c in link_cols]).alias("links")
        )
    payload_fields.extend(c.alias(n) for n, c in sideload_cols)

    out = df.withColumn("payload", F.struct(*payload_fields))
    return out.drop(*[f"__ids_{n}" for n in has_many], *[f"__objs_{n}" for n in has_many])


def serialize_deleted(
    parent: DataFrame, parent_id: str, attributes: list[str]
) -> DataFrame:
    """P5: destroyed records serialize pk + declared attributes (whatever
    is still known); links omitted (deleted_record_serializer.rb:4-16)."""
    fields = [F.col(parent_id).alias("id")] + [
        F.col(a) for a in attributes if a != parent_id
    ]
    return parent.withColumn("payload", F.struct(*fields))


def serialize_bypass(parent: DataFrame, cols: list[str]) -> DataFrame:
    """P6: ``serialize: false`` — raw projection, no serializer
    (id-only DTOs for e.g. mass deletes, README.md:180-213)."""
    return parent.withColumn("payload", F.struct(*[F.col(c) for c in cols]))
