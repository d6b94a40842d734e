"""SURVEY.md section 2.10 is the authoritative operator manifest the engine
is graded against - it must never drift from the registry.  Parses the two
declared-query lists out of the markdown and asserts exact equality with
what the code actually registers."""

from __future__ import annotations

import re
from pathlib import Path

from pei_nwdaf_data_ingestion_spark import registry

registry.load_all()

SURVEY = Path(__file__).resolve().parent.parent / "SURVEY.md"


def _manifest_sets() -> tuple[set[str], set[str]]:
    text = SURVEY.read_text()
    start = text.index("### 2.10")
    end = text.index("Determinism rules", start)
    section = text[start:end]
    oracled_part, rows_only_part = section.split("**rows-only (no oracle)**")
    def names(part: str) -> set[str]:
        return set(re.findall(r"`([a-z0-9_]+)`", part))
    return names(oracled_part.split("**DuckDB-oracled")[1]), names(rows_only_part)


def test_survey_manifest_matches_registry():
    oracled, rows_only = _manifest_sets()
    reg_oracled = set(registry.ORACLES)
    reg_rows_only = set(registry.QUERIES) - reg_oracled
    assert oracled == reg_oracled, (
        f"SURVEY-only: {sorted(oracled - reg_oracled)}; "
        f"registry-only: {sorted(reg_oracled - oracled)}"
    )
    assert rows_only == reg_rows_only, (
        f"SURVEY-only: {sorted(rows_only - reg_rows_only)}; "
        f"registry-only: {sorted(reg_rows_only - rows_only)}"
    )


def test_every_declared_id_has_cumulative_driver_signal():
    """Coverage-hole gate (VERDICT r2 next-round #7): every declared query
    must have appeared in at least one driver CORRECTNESS_r*.json.  The
    driver samples the first ~50 registrations per round, so holes are an
    ordering bug (registry priority order exists to close them), not a code
    bug - but they cost a round each time, so the suite must catch them.

    Grace period (derived, not hand-maintained - VERDICT r4 #4: the hand
    list went stale two rounds running): ids in registry.ADDED_IN_ROUND get
    a pass while no CORRECTNESS file of a LATER round exists.  An id added
    in round N cannot have been sampled before N, and the round-N file was
    recorded against a <=50-slot window, so additions beyond the window in
    their own birth round are queued debt, not a coverage hole (VERDICT r6
    #1); the staleness-first registry order drains them the following
    round, at which point the grace lapses and the gate bites."""
    import json

    root = Path(__file__).resolve().parent.parent
    seen: set[str] = set()
    latest_round = 0
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        seen |= set(json.loads(f.read_text()))
        latest_round = max(latest_round, int(f.stem.split("_r")[1]))
    # phantom-id guard (VERDICT r3 #2): a grace-listed id that is not even
    # registered is a dangling name, not a sampling gap
    phantom = set(registry.ADDED_IN_ROUND) - set(registry.QUERIES)
    assert not phantom, (
        f"ADDED_IN_ROUND ids missing from registry.QUERIES (phantom names - "
        f"implement or delete): {sorted(phantom)}"
    )
    grace = {
        name
        for name, rnd in registry.ADDED_IN_ROUND.items()
        if rnd >= latest_round
    }
    missing = set(registry.QUERIES) - seen - grace
    assert not missing, (
        f"declared queries with NO driver correctness signal through round "
        f"{latest_round} (fix registration order in registry priority, or "
        f"bump their registry.ADDED_IN_ROUND round): {sorted(missing)}"
    )
