"""Model-based check of the statedir invariant: against a driver-side
model (a dict of committed batches), a RANDOM interleaving of batch
commits, compactions, torn compactions, and interrupted deletes must
never change what any executing batch observes.

This generalizes test_statedir.py's hand-picked interleavings: hypothesis
drives the schedule (including the leveled tier's minor delta folds and
torn delta publishes), the model is the obviously-correct union, and the
assertion is read_state == model at every step for both the next batch id
and the accessor horizon (1 << 62)."""

from __future__ import annotations

import os
import shutil

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from stream_cdc_spark.streaming import statedir

SCHEMA = "id bigint, v bigint"

# ops: ("commit",) advances the stream one batch; ("compact",) folds at
# the current head; ("torn_compact",) fakes a crash mid-publish (dir
# without _SUCCESS); ("interrupted_delete",) publishes by hand but leaves
# the folded dirs in place.
OPS = st.lists(
    st.sampled_from(
        [
            "commit",
            "compact",
            "minor_compact",
            "torn_compact",
            "torn_delta",
            "interrupted_delete",
        ]
    ),
    min_size=4,
    max_size=10,
)


@pytest.fixture(scope="module")
def sd_root(tmp_path_factory):
    return str(tmp_path_factory.mktemp("statedir-model"))


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=OPS)
def test_random_interleavings_preserve_reads(spark, sd_root, ops):
    root = os.path.join(sd_root, "-".join(o[0] for o in ops))
    shutil.rmtree(root, ignore_errors=True)
    model: dict[int, list[tuple[int, int]]] = {}
    head = 0  # next batch id the stream would execute

    def observed(batch_id):
        return sorted(
            map(tuple, statedir.read_state(spark, root, SCHEMA, batch_id).collect())
        )

    def expected(batch_id):
        return sorted(r for b, rows in model.items() if b < batch_id for r in rows)

    for op in ops:
        if op == "commit":
            rows = [(head * 10 + j, head) for j in range(2)]
            spark.createDataFrame(rows, SCHEMA).write.mode("overwrite").parquet(
                statedir.batch_dir(root, head)
            )
            model[head] = rows
            head += 1
        elif op == "compact":
            statedir.compact(spark, root, SCHEMA, head)
        elif op == "minor_compact":
            statedir.compact_minor(spark, root, SCHEMA, head)
        elif op == "torn_delta":
            torn = os.path.join(root, f"delta=000000000-{head:09d}")
            if not os.path.exists(torn):
                os.makedirs(torn)
                with open(os.path.join(torn, "part-0.parquet"), "wb") as f:
                    f.write(b"\x00torn")
        elif op == "torn_compact":
            torn = os.path.join(root, f"compact={head:09d}")
            if not os.path.exists(torn):
                os.makedirs(torn)
                with open(os.path.join(torn, "part-0.parquet"), "wb") as f:
                    f.write(b"\x00torn")
        elif op == "interrupted_delete":
            # hand-publish a valid snapshot at the head but skip deletes
            paths = statedir.state_paths(root, head)
            if paths:
                df = statedir.read_state(spark, root, SCHEMA, head)
                tmp = os.path.join(root, f".tmp-compact-{head:09d}")
                shutil.rmtree(tmp, ignore_errors=True)
                df.write.mode("overwrite").parquet(tmp)
                dest = os.path.join(root, f"compact={head:09d}")
                shutil.rmtree(dest, ignore_errors=True)
                os.rename(tmp, dest)
        # the two reads every consumer performs: the executing batch
        # (exactly-once replay view) and the accessor horizon
        assert observed(head) == expected(head), (op, head)
        assert observed(1 << 62) == expected(1 << 62), (op, head)
