"""One-off bit-hazard audit: run every DuckDB oracle and flag cells
whose float64 bits are hazardous for the driver's bit hash — negative
zero (the q_ransac_line round-9 FAIL class) and non-canonical NaNs.

Usage: python tools/audit_negzero.py [sf_dir] [query ...]
Default sf_dir: /root/testdata/sf0.1 (the bench sf — the round-9
judge's sweep covered sf0.01; verdict #9 asked for the decade above).

DuckDB-only on purpose: the Spark side is covered by the strict local
gate's packed-double comparison (testing.py), so any oracle-side -0.0
either matches Spark bit-for-bit (both fine) or fails the gate. This
audit catches the remaining corner: BOTH engines emitting -0.0 for a
query nobody re-runs locally, which would pass gate AND driver today
but flip on any engine's round/sign behavior change.
"""

from __future__ import annotations

import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zmaxion_spark.queries import REGISTRY  # noqa: E402
from zmaxion_spark.testing import duckdb_connect  # noqa: E402

_NAN_BITS = struct.unpack("<Q", struct.pack("<d", float("nan")))[0]


def main() -> None:
    args = sys.argv[1:]
    # Strict arg validation (ADVICE r10): an arg that is neither an
    # existing directory nor a REGISTRY name used to be silently
    # dropped, so a mistyped query name (or nonexistent sf_dir) made
    # the audit "pass" against the wrong target. Mirror bench.py's
    # unknown-name exit-2 handling instead.
    sf_dir = "/root/testdata/sf0.1"
    if args and ("/" in args[0] or os.path.isdir(args[0])):
        if not os.path.isdir(args[0]):
            print(f"audit_negzero: no such sf_dir: {args[0]}", file=sys.stderr)
            sys.exit(2)
        sf_dir = args[0]
        args = args[1:]
    unknown = [a for a in args if a not in REGISTRY]
    if unknown:
        print(f"audit_negzero: unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)
    names = args or sorted(
        n for n, q in REGISTRY.items() if q.oracle is not None
    )
    # duckdb_connect handles both fixture layouts (single .parquet
    # files and Spark part-file directories, as in .scratch/sf1+).
    con = duckdb_connect(sf_dir)
    hits: list[str] = []
    errs: list[str] = []
    for name in names:
        try:
            df = con.execute(REGISTRY[name].oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            errs.append(f"{name}: {type(e).__name__}: {e}"[:160])
            continue
        for c in df.columns:
            col = df[c]
            if col.dtype.kind != "f":
                continue
            bits = col.to_numpy().astype("float64").view(np.uint64)
            neg_zero = int(np.sum(bits == 0x8000000000000000))
            is_nan = np.isnan(col.to_numpy().astype("float64"))
            odd_nan = int(np.sum(is_nan & (bits != _NAN_BITS)))
            if neg_zero or odd_nan:
                hits.append(
                    f"{name}.{c}: neg_zero={neg_zero} odd_nan={odd_nan}"
                )
    for h in hits:
        print("HAZARD", h)
    for e in errs:
        print("ERR   ", e)
    print(
        f"{len(names)} oracles audited at {sf_dir}: "
        f"{len(hits)} hazardous columns, {len(errs)} errors"
    )
    sys.exit(1 if hits else 0)


if __name__ == "__main__":
    main()
