"""Refresh plans/entry_hashes.json — the per-entry source-fingerprint
record behind the derived changed-code re-gate rule (VERDICT r8 item 5).

Run after changing any operator module or catalog entry:

    python scripts/update_entry_hashes.py

Entries whose fingerprint changed are stamped with
``regate_round = <next driver round>``; until a CORRECTNESS_r{N}.json
with N >= regate_round shows them green, the window-priority test forces
them into the 50-slot driver window.  Entries whose fingerprint is
unchanged keep their existing stamp, so an already-verified entry is
never re-dragged into the window by someone ELSE'S edit to an unrelated
module.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_pyspark_streaming_analytics_spark.plans import CATALOG  # noqa: E402
from hadoop_pyspark_streaming_analytics_spark.plans import fingerprint as fp  # noqa: E402


def main() -> None:
    records, changed = fp.refresh_hashes(CATALOG)
    with open(fp.HASHES_PATH, "w") as f:
        json.dump(records, f, indent=1, sort_keys=True)
        f.write("\n")
    n = len(records) - ("__meta__" in records)
    print(f"{n} entries recorded (python {fp.PY_VERSION}) -> {fp.HASHES_PATH}")
    if changed:
        print(f"{len(changed)} changed (stamped regate_round="
              f"{records[changed[0]]['regate_round']}):")
        for name in changed:
            print(f"  {name}")
    else:
        print("no fingerprint changes")


if __name__ == "__main__":
    main()
