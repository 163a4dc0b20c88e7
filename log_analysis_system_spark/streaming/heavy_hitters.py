"""Streaming heavy hitters: Misra-Gries summaries over an unbounded item
stream with BOUNDED state and a provable error guarantee.

Beyond the reference (its streaming top-N, AdClickRealTimeSpark.java
province top-3, re-ranks EXACT cumulative counts — state grows with the
key universe): a 100 TB / high-cardinality stream cannot hold one counter
per distinct item. Misra-Gries keeps at most ``k`` counters per state
group and guarantees, for every item in group ``g`` with true count
``t`` after ``N_g`` processed rows:

    est <= t <= est + (N_g - sum(counters)) / (k + 1)

(est = 0 if untracked), so any item with t > N_g/(k+1) is GUARANTEED to
be tracked. The test asserts the bound against exact counts, not just
plausibility.

Distribution: items are hash-partitioned into ``n_groups`` state groups;
each group runs an independent summary over ITS items (an item lives in
exactly one group, so per-group guarantees carry over unchanged — unlike
splitting one summary across tasks, which would break the invariant).
State per group is exactly k (item, count) pairs; executor memory is
O(n_groups x k) regardless of stream length or cardinality.

Determinism: batch rows are processed in event_id order inside each
group (Misra-Gries is arrival-order-dependent; a sorted fold pins the
result for a given batch sequence — same policy as streaming/corpus.py).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def misra_gries_stream(
    items: DataFrame,
    item_col: str = "item",
    order_col: str = "event_id",
    k: int = 8,
    n_groups: int = 4,
) -> DataFrame:
    """items: a streaming DataFrame with ``item_col`` (string) and
    ``order_col`` (unique, orderable). Emits per batch, per state group:
    the tracked (item, est) counters plus the group's processed-row and
    retained-count totals (what the guarantee bound needs)."""
    keyed = items.withColumn(
        "grp", F.pmod(F.xxhash64(F.col(item_col)), F.lit(n_groups))
    ).select("grp", F.col(item_col).alias("item"), F.col(order_col).alias("ord"))

    def fold(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            names, counts, n_proc = (
                list(state.get[0]),
                list(state.get[1]),
                int(state.get[2]),
            )
        else:
            names, counts, n_proc = [], [], 0
        slots = dict(zip(names, counts))
        for pdf in pdfs:
            pdf = pdf.sort_values("ord")
            for row in pdf.itertuples(index=False):
                n_proc += 1
                it = row.item
                if it in slots:
                    slots[it] += 1
                elif len(slots) < k:
                    slots[it] = 1
                else:
                    # decrement-all: the step that buys the N/(k+1) bound
                    for name in list(slots):
                        slots[name] -= 1
                        if slots[name] == 0:
                            del slots[name]
        names = sorted(slots)  # deterministic state + output order
        counts = [slots[n] for n in names]
        state.update((names, counts, n_proc))
        yield pd.DataFrame(
            {
                "grp": [int(key[0])] * len(names),
                "item": names,
                "est": counts,
                "n_processed": [n_proc] * len(names),
                "n_retained": [sum(counts)] * len(names),
            }
        )

    return keyed.groupBy("grp").applyInPandasWithState(
        fold,
        outputStructType=(
            "grp long, item string, est long, n_processed long, n_retained long"
        ),
        stateStructType=(
            "names array<string>, counts array<long>, n_processed long"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
