"""Guard rails for driver-local tails.

A handful of operators deliberately finish on the driver — disclosed
sequential-by-contract semantics (PLM/Leiden contracted tails, the SCD
expansion family's adjacency cache, CutClustering's breakpoint search,
DFS replay). This module makes that boundary explicit and impossible
to cross silently:

- ``guard_local_collect(n_rows, ...)`` raises :class:`LocalTailError`
  BEFORE a collect whose estimated driver payload exceeds
  ``max_bytes`` (cap by bytes, not rows: a row estimate alone would
  let a wide row slip through a row-count gate).
- ``log_local_tail(what, n_rows, est_bytes)`` emits one WARNING line
  whenever a driver-local tail engages, so a run that falls back to
  local execution is visible in the logs instead of silent.

Row-size constants are measured on this interpreter:
``Row(src=long, dst=long, weight=double)`` costs ~112 bytes as a
driver-side tuple; plain longs ~32 bytes. Callers with wider rows pass
their own ``row_bytes``.
"""

from __future__ import annotations

import logging

log = logging.getLogger("networkit_spark.local_tail")

#: driver-side cost of one collected (long, long, double) arc row
ARC_ROW_BYTES = 112
#: driver-side cost of one collected long id
ID_ROW_BYTES = 32
#: default ceiling for any driver-local tail (256 MiB)
DEFAULT_MAX_LOCAL_BYTES = 256 << 20


class LocalTailError(RuntimeError):
    """A driver-local tail would exceed its declared byte budget."""


def guard_local_collect(
    n_rows: int,
    *,
    row_bytes: int = ARC_ROW_BYTES,
    max_bytes: int = DEFAULT_MAX_LOCAL_BYTES,
    what: str = "driver-local tail",
) -> int:
    """Check an upcoming collect of ``n_rows`` rows against the byte
    budget; return the estimate or raise :class:`LocalTailError`."""
    est = int(n_rows) * int(row_bytes)
    if max_bytes and est > max_bytes:
        raise LocalTailError(
            f"{what}: refusing to collect ~{est / 2**20:.1f} MiB "
            f"({n_rows} rows x {row_bytes} B/row) to the driver; "
            f"cap is {max_bytes / 2**20:.1f} MiB. Raise the operator's "
            f"max-bytes parameter only if the driver truly has the room."
        )
    return est


def log_local_tail(what: str, n_rows: int, est_bytes: int) -> None:
    """One visible line per engaged driver-local tail."""
    log.warning(
        "%s: engaging driver-local path (%d rows, ~%.1f MiB on the driver)",
        what,
        n_rows,
        est_bytes / 2**20,
    )
