"""Endpoint-lifecycle control loop + poll-stamp snapshots.

The reference's evaluation tooling polls a resource until it reaches a
target state with sleep/backoff (`evaluation_tools/Endpoint_Starter.py:
47-57`, `Endpoint_Stopper.py`) and appends `current_timestamp() AS
polled_timestamp` snapshots of endpoint state on every poll
(`evaluation_tools/Endpoint_Poller.py:158` shape). Both are generic
control-plane operators, re-expressed engine-side:

- :func:`wait_until` — poll ``probe_fn`` until it returns ``target``
  (or a predicate passes), with linear/exponential backoff, bounded by
  ``timeout_sec``. Clock and sleeper are injectable so tests are
  deterministic and instant.
- :func:`with_poll_stamp` — append-mode snapshot stamping (P5/F2):
  tag a state frame with the poll timestamp; composes with
  ``schema_reconcile_append``/``merge_upsert`` exactly like the
  reference's poller → reconcile → append trace.

Driver-side by design: lifecycle control is control-plane work over a
handful of states, not data-plane — nothing here touches executors.
"""

from __future__ import annotations

import time as _time
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class WaitResult:
    """Outcome of a wait_until loop, with the full probe history."""

    reached: bool
    final_state: object
    n_polls: int
    elapsed_sec: float
    history: list[tuple[float, object]] = field(default_factory=list)


def wait_until(
    probe_fn: Callable[[], object],
    target: object = None,
    predicate: Callable[[object], bool] | None = None,
    timeout_sec: float = 600.0,
    poll_interval_sec: float = 5.0,
    backoff: float = 1.0,
    max_interval_sec: float = 60.0,
    clock: Callable[[], float] | None = None,
    sleeper: Callable[[float], None] | None = None,
) -> WaitResult:
    """Poll ``probe_fn`` until its value equals ``target`` (or satisfies
    ``predicate``), sleeping ``poll_interval_sec`` (multiplied by
    ``backoff`` each miss, capped at ``max_interval_sec``) between
    polls, for at most ``timeout_sec``.

    Returns a :class:`WaitResult` with the (monotonic-ts, state) probe
    history — the status-history trail the reference prints per poll.
    """
    if predicate is None:
        predicate = lambda s: s == target  # noqa: E731
    clock = clock or _time.monotonic
    sleeper = sleeper or _time.sleep

    start = clock()
    interval = poll_interval_sec
    history: list[tuple[float, object]] = []
    n = 0
    while True:
        state = probe_fn()
        n += 1
        now = clock()
        history.append((now - start, state))
        if predicate(state):
            return WaitResult(True, state, n, now - start, history)
        if now - start + interval > timeout_sec:
            return WaitResult(False, state, n, now - start, history)
        sleeper(interval)
        interval = min(interval * backoff, max_interval_sec)


def with_poll_stamp(
    df: DataFrame,
    stamp_col: str = "polled_timestamp",
    at: str | Column | None = None,
) -> DataFrame:
    """Append the poll timestamp to a state snapshot (P5/F2).

    ``at=None`` stamps with ``current_timestamp()`` (production, the
    reference's EP:158 shape); pass a literal for deterministic tests
    and oracle comparisons.
    """
    if at is None:
        stamp = F.current_timestamp()
    elif isinstance(at, str):
        stamp = F.lit(at).cast("timestamp")
    else:
        stamp = at
    return df.withColumn(stamp_col, stamp)


def poll_history_df(spark, result: WaitResult, columns: Sequence[str] = ("elapsed_sec", "state")) -> DataFrame:
    """Materialize a WaitResult's probe history as a small DataFrame —
    the appendable status-history table of the reference's poller."""
    rows = [(float(t), str(s)) for t, s in result.history]
    return spark.createDataFrame(rows, f"{columns[0]} double, {columns[1]} string")


def ensure_endpoint_state(
    get_state: Callable[[], object],
    request: Callable[[str], None],
    action: str,
    target: object,
    **wait_kwargs,
) -> tuple[WaitResult, bool]:
    """The reference's Endpoint_Starter/Stopper control loop
    (`evaluation_tools/Endpoint_Starter.py:47-57`,
    `Endpoint_Stopper.py`): probe the endpoint; if it is already in the
    ``target`` state, do NOT issue the action (one probe, no request);
    otherwise issue ``request(action)`` exactly once and poll until
    ``target`` (or the wait budget runs out). The already-at-target
    fast path is an INTENTIONAL deviation from the reference, which
    posts the start request unconditionally before polling
    (`Endpoint_Starter.py:31`) — gating the request on the probe saves
    a redundant control-plane mutation; the polling contract is
    otherwise the reference's. Transport is injectable — production
    passes REST calls (the same driver-side control-plane posture as
    sources/json_records.py's paginated source); tests pass a
    deterministic state machine.

    Returns ``(WaitResult, requested)`` where ``requested`` says
    whether the action was actually issued."""
    state = get_state()
    if state == target:
        return WaitResult(True, state, 1, 0.0, [(0.0, state)]), False
    request(action)
    return wait_until(get_state, target=target, **wait_kwargs), True


def start_endpoint(
    get_state: Callable[[], object],
    request: Callable[[str], None],
    running_state: str = "RUNNING",
    **wait_kwargs,
) -> tuple[WaitResult, bool]:
    """Starter verb: no-op if already running, else request ``start``
    and poll until ``running_state``."""
    return ensure_endpoint_state(
        get_state, request, "start", running_state, **wait_kwargs
    )


def stop_endpoint(
    get_state: Callable[[], object],
    request: Callable[[str], None],
    stopped_state: str = "STOPPED",
    **wait_kwargs,
) -> tuple[WaitResult, bool]:
    """Stopper verb: no-op if already stopped, else request ``stop``
    and poll until ``stopped_state``."""
    return ensure_endpoint_state(
        get_state, request, "stop", stopped_state, **wait_kwargs
    )
