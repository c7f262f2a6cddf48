"""Cross-session DataFrame plumbing (VERDICT r04 item 4).

Conf-mutating stages (the CC loop's shuffle sizing + AQE toggle, run()'s
constraint-propagation tuning) used to set-and-restore confs on the
caller's SparkSession — correct single-threaded, but a concurrent query
on the same session mid-stage would observe the mutated confs.  Instead,
those stages now execute on a PRIVATE ``spark.newSession()`` clone
(isolated SQL conf, shared SparkContext / cache / localCheckpoint
blocks) and only the stage-internal session is mutated.

``rebind`` is the supported hand-off channel: a global temp view is
visible across sessions sharing a context, and Datasets analyze eagerly,
so the view can be registered, resolved into the target session, and
dropped immediately — no catalog residue, and the resulting plan (and
its ``semanticHash``, which the checkpoint manifest folds in) is
identical to the source frame's.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

# runtime confs a private execution session mirrors from its parent: these
# are the knobs build_spark tunes and users commonly set at runtime;
# newSession() only inherits builder-time (SparkConf-level) values.
# The second group (ADVICE r05) carries the SEMANTIC confs whose silent
# reversion to builder-time defaults could change results for callers who
# set them at runtime — timezone-dependent expressions, ANSI error
# behavior, identifier case sensitivity, legacy datetime parsing.
MIRRORED_CONFS = (
    "spark.sql.shuffle.partitions",
    "spark.sql.adaptive.enabled",
    "spark.sql.adaptive.skewJoin.enabled",
    "spark.sql.execution.arrow.pyspark.enabled",
    "spark.sql.execution.arrow.maxRecordsPerBatch",
    "spark.sql.session.timeZone",
    "spark.sql.ansi.enabled",
    "spark.sql.caseSensitive",
    "spark.sql.legacy.timeParserPolicy",
)


def rebind(df: DataFrame, target: SparkSession) -> DataFrame:
    """Return ``df``'s (analyzed) plan as a DataFrame bound to ``target``.
    No-op when already bound there.  Sessions must share a SparkContext
    (always true for ``newSession()`` clones)."""
    if df.sparkSession is target:
        return df
    name = f"sparkdedup_rebind_{uuid.uuid4().hex}"
    df.createOrReplaceGlobalTempView(name)
    try:
        return target.table(f"global_temp.{name}")
    finally:
        df.sparkSession.catalog.dropGlobalTempView(name)


def private_session(parent: SparkSession) -> SparkSession:
    """A fresh session whose conf mutations cannot be observed by
    ``parent``, with the parent's runtime values for the confs the
    pipeline depends on (``MIRRORED_CONFS``) carried over."""
    child = parent.newSession()
    for k in MIRRORED_CONFS:
        v = parent.conf.get(k, None)
        if v is not None:
            child.conf.set(k, v)
    return child
