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
