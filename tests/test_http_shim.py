"""HTTP -> stream ingestion demo (SURVEY.md 2.1 source row): the golden
payloads of the reference's endpoint tests
(/root/reference/tests/test_receiver.py:203-221,306-345) POSTed over real
HTTP land in the spool directory and flow through the streaming normalizer,
with the reference's 400/403/204 status contract."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from pei_nwdaf_data_ingestion_spark.pipeline.nef import SUBSCRIPTION
from pei_nwdaf_data_ingestion_spark.streaming.http_shim import NotifyHTTPShim
from pei_nwdaf_data_ingestion_spark.streaming.ingest import (
    build_ingest_stream,
    run_to_memory,
)
from tests.test_reference_fidelity import MOBILITY_NOTIF, PERF_NOTIF, SUB


def _post(url: str, payload: dict) -> int:
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status
    except urllib.error.HTTPError as e:
        return e.code


def test_http_post_status_contract_and_stream(spark, tmp_path):
    spool = str(tmp_path / "spool")
    with NotifyHTTPShim(spool, {"test-notif-001"}) as shim:
        # acceptance: golden PERF_DATA + UE_MOBILITY payloads
        assert _post(shim.url, PERF_NOTIF) == 204
        assert _post(shim.url, MOBILITY_NOTIF) == 204
        # the 400 path (receiver.py:358-361) - missing/empty notifId
        assert _post(shim.url, {"eventNotifs": []}) == 400
        assert _post(shim.url, dict(PERF_NOTIF, notifId="")) == 400
        # the 403 path (receiver.py:363-365) - unknown subscription
        assert _post(shim.url, dict(PERF_NOTIF, notifId="nope")) == 403

    # only the two accepted payloads reached the spool
    subs = spark.createDataFrame([SUB], SUBSCRIPTION)
    stream = build_ingest_stream(spark, spool, subs)
    run_to_memory(stream, "http_shim_out")
    rows = spark.table("http_shim_out").collect()
    assert sorted(r["event"] for r in rows) == ["PERF_DATA", "UE_MOBILITY"]
    perf = next(r for r in rows if r["event"] == "PERF_DATA")
    assert perf["ueIpv4Addr"] == "10.0.1.10"
    assert perf["thrputUl_mbps"] == pytest.approx(11.74)
    assert perf["ts_unix"] == 1776680100
    mob = next(r for r in rows if r["event"] == "UE_MOBILITY")
    assert mob["supi"] == "imsi-001011234567890"
    assert [t["tac"] for t in mob["trajectory"]] == ["000001", "000002"]
