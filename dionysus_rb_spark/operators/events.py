"""Event derivation & dispatch (SURVEY §2.4 F2/F8, §2.9 names/keys).

F2  soft-delete event classifier  ref lib/dionysus/producer/outbox.rb:74-102,
                                      outbox/publishable.rb:38-68
F8  event-type dispatch           ref lib/dionysus/consumer/dionysus_event.rb:14-28

Plus the name/key scalar functions (all whole-stage-codegen friendly
built-ins — no UDFs):
    event name   "{resource}_{created|updated|destroyed}"
                 ref lib/dionysus/producer/outbox/event_name.rb:11-25
    message key  "Model:id"      ref lib/dionysus/producer/key.rb:11-13
    topic name   "{namespace}_{name}"  ref lib/dionysus/topic_name.rb:12-14
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .merge import EVENT_CREATED, EVENT_DESTROYED, EVENT_UPDATED, KNOWN_EVENTS


def event_name(resource: Column, action: Column) -> Column:
    return F.concat_ws("_", resource, action)


def message_key(model: Column, record_id: Column) -> Column:
    return F.concat(model, F.lit(":"), record_id.cast("string"))


def topic_name(name: Column, namespace: str = "dionysus") -> Column:
    return F.concat(F.lit(namespace + "_"), name)


def parse_event_name(event: Column) -> tuple[Column, Column]:
    """Inverse of event_name: ``rental_created`` -> (``rental``, ``created``)
    (ref consumer/dionysus_event.rb:30-36 derives model from event name)."""
    action = F.regexp_extract(event, r"_(created|updated|destroyed)$", 1)
    resource = F.regexp_replace(event, r"_(created|updated|destroyed)$", "")
    return resource, action


def classify_soft_delete(
    prev_canceled: Column,
    now_canceled: Column,
    is_new_record: Column,
    publish_canceled_updates: bool = False,
) -> Column:
    """F2: derive the event type from the soft-delete state transition.

    The reference's state machine over ``previous_changes[canceled_at]``
    (lib/dionysus/producer/outbox.rb:74-102):
      * record was canceled, now uncanceled  => created   (restore)
      * record was live,    now canceled     => destroyed (soft delete)
      * still canceled                       => suppressed (NULL here)
        unless ``publish_canceled_updates``  => updated
      * still live                           => updated
      * brand-new record                     => created (canceled new
        records are suppressed)
    Returns NULL for suppressed events — filter on isNotNull() to drop.
    """
    still_canceled = (
        F.lit(EVENT_UPDATED) if publish_canceled_updates else F.lit(None).cast("string")
    )
    return (
        F.when(is_new_record & now_canceled.isNull(), F.lit(EVENT_CREATED))
        .when(is_new_record, F.lit(None).cast("string"))
        .when(prev_canceled.isNotNull() & now_canceled.isNull(), F.lit(EVENT_CREATED))
        .when(prev_canceled.isNull() & now_canceled.isNotNull(), F.lit(EVENT_DESTROYED))
        .when(prev_canceled.isNotNull() & now_canceled.isNotNull(), still_canceled)
        .otherwise(F.lit(EVENT_UPDATED))
    )


def dispatch_events(df: DataFrame, action_col: str) -> tuple[DataFrame, DataFrame]:
    """F8: split (known, unknown) event streams. The reference logs
    unknown event names and drops them (dionysus_event.rb:14-28,
    persistor.rb:98-100); unknowns here feed a dead-letter sink."""
    known = df.filter(F.col(action_col).isin(*KNOWN_EVENTS))
    unknown = df.filter(
        ~F.col(action_col).isin(*KNOWN_EVENTS) | F.col(action_col).isNull()
    )
    return known, unknown
