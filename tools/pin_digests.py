#!/usr/bin/env python
"""Record the rows-only result digests (VERDICT r13 item 5's stability
evidence): run every oracle-less query at the driver's sf0.01 scale and
write {id: {result_digest, rows}} to tools/rows_only_digests.json.

The digest is a deterministic fingerprint of the WHOLE result
(registry.append_result_digest - order/partition/task-layout
independent), so re-running this tool over unchanged code MUST
reproduce the file byte-for-byte; a diff is a value regression in a
query the DuckDB oracle cannot see.  Regenerate with
`python tools/pin_digests.py` after any intentional rows-only change
and commit the diff with the change that explains it.

tests/test_result_digest.py checks a cheap subset against this file on
every suite run; the full file is the cross-round record.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pei_nwdaf_data_ingestion_spark import registry  # noqa: E402
from pei_nwdaf_data_ingestion_spark.session import get_spark  # noqa: E402

SF = os.environ.get("DIGEST_PIN_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "rows_only_digests.json")


def main() -> None:
    registry.load_all()
    spark = get_spark(app_name="pin_digests", shuffle_partitions=8)
    rows_only = sorted(n for n in registry.QUERIES if n not in registry.ORACLES)
    pins: dict = {"_sf_dir": SF}
    for name in rows_only:
        df = registry.QUERIES[name](spark, SF)
        first = df.select("result_digest").limit(1).collect()
        pins[name] = {
            "result_digest": first[0][0] if first else None,
            "rows": df.count(),
        }
        print(f"{name}: {pins[name]}", flush=True)
    with open(OUT, "w") as fh:
        json.dump(pins, fh, indent=1, sort_keys=True)
    print(f"wrote {len(rows_only)} digests to {OUT}")
    spark.stop()


if __name__ == "__main__":
    main()
