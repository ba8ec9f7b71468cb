"""One authoritative registry count for round-close doc hygiene.

Every round the README / SCALING.md / PARITY.md restated the registry
size from memory and drifted (r10 VERDICT "what's wrong" #3: 206 vs
208/204 vs 209 vs 205, each a different vintage of the same growing
registry).  This derives the numbers from the registry itself — run it
at round close and paste its one-line summary into the docs:

    python tools/registry_count.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import __spark_entry__ as se

    q = se.queries()
    o = se.oracle_sql()
    missing = sorted(set(o) - set(q))
    if missing:
        raise SystemExit(f"oracle_sql keys without queries(): {missing}")
    rows_only = sorted(set(q) - set(o))
    out = {
        "queries": len(q),
        "with_oracle": len(o),
        "rows_only": len(rows_only),
        "rows_only_names": rows_only,
    }
    print(json.dumps(out, indent=2))
    print(
        f"\nsummary: {len(q)} registered queries "
        f"({len(o)} oracle-hashed + {len(rows_only)} declared rows-only)"
    )


if __name__ == "__main__":
    main()
