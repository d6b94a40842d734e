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


def _request(
    base: str,
    path: str,
    method: str = "GET",
    payload: dict | None = None,
    token: str | None = None,
) -> tuple[int, dict | None]:
    headers = {"Content-Type": "application/json"}
    if token is not None:
        headers["Authorization"] = f"Bearer {token}"
    req = urllib.request.Request(
        base + path,
        data=None if payload is None else json.dumps(payload).encode(),
        headers=headers,
        method=method,
    )
    try:
        with urllib.request.urlopen(req) as resp:
            body = resp.read()
            return resp.status, json.loads(body) if body else None
    except urllib.error.HTTPError as e:
        body = e.read()
        return e.code, json.loads(body) if body else None


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


class _DictStore:
    """In-memory stand-in with the SubscriptionStore method surface (the
    parquet-backed store is exercised in test_pipeline_components)."""

    def __init__(self):
        self.rows: dict[str, dict] = {}

    def add(self, sub):
        self.rows[sub["notif_id"]] = sub

    def get(self, notif_id):
        return self.rows.get(notif_id)

    def remove(self, notif_id):
        return self.rows.pop(notif_id, None) is not None

    def list(self):
        return list(self.rows.values())


SUB_BODY = {
    # golden create payload, reference tests/test_receiver.py:114-120
    "notifId": "test-notif-001",
    "nefUrl": "http://nef:8090/nnef-event-exposure/v1/subscriptions",
    "events": ["PERF_DATA", "UE_MOBILITY"],
    "snssai": {"sst": 1, "sd": "000001"},
    "dnn": "internet",
}


def test_auth_status_contract(tmp_path):
    """The reference AuthMiddleware's status behavior
    (auth_middleware.py:22-59, exercised by its 401/403 endpoint tests):
    401 missing/expired/invalid token, 403 wrong role, 200 with a required
    role, /nef/notify skipped, DEV_MODE bypass."""
    from pei_nwdaf_data_ingestion_spark.streaming.http_shim import HmacTokenAuth

    auth = HmacTokenAuth(secret="test-secret")
    store = _DictStore()
    with NotifyHTTPShim(
        str(tmp_path / "spool"), {"test-notif-001"}, auth=auth, store=store
    ) as shim:
        base = shim.url.rsplit("/nef/notify", 1)[0]
        # 401: no token at all
        code, body = _request(base, "/nef/subscriptions")
        assert (code, body["detail"]) == (401, "Missing authorization token")
        # 401: expired
        expired = auth.issue(["network_engineer"], exp=0)
        code, body = _request(base, "/nef/subscriptions", token=expired)
        assert (code, body["detail"]) == (401, "Token expired")
        # 401: tampered signature
        good = auth.issue(["network_engineer"])
        bad_sig = good[:-4] + ("0000" if good[-4:] != "0000" else "1111")
        code, body = _request(base, "/nef/subscriptions", token=bad_sig)
        assert (code, body["detail"]) == (401, "Invalid token")
        # 403: authenticated but no required realm role
        peasant = auth.issue(["observer"])
        code, body = _request(base, "/nef/subscriptions", token=peasant)
        assert (code, body["detail"]) == (403, "Insufficient permissions")
        # 200: either required role passes (REQUIRED_ROLES is an ANY-of set)
        for role in ("network_engineer", "debug_admin"):
            code, _ = _request(
                base, "/nef/subscriptions", token=auth.issue([role])
            )
            assert code == 200
        # /nef/notify is in SKIP_PATHS - no token required even with auth on
        assert _post(shim.url, {"notifId": "test-notif-001"}) == 204

    # DEV_MODE bypass (auth_middleware.py:24-25)
    dev = HmacTokenAuth(secret="test-secret", dev_mode=True)
    with NotifyHTTPShim(
        str(tmp_path / "spool2"), set(), auth=dev, store=_DictStore()
    ) as shim:
        base = shim.url.rsplit("/nef/notify", 1)[0]
        code, _ = _request(base, "/nef/subscriptions")
        assert code == 200


def test_subscription_crud_endpoints(tmp_path):
    """Control-plane CRUD contract (receiver.py:296-351) minus the outbound
    NEF call: 201 create (422 on missing fields), 200 list, 204/404 delete."""
    store = _DictStore()
    with NotifyHTTPShim(str(tmp_path / "spool"), set(), store=store) as shim:
        base = shim.url.rsplit("/nef/notify", 1)[0]
        code, body = _request(base, "/nef/subscriptions", "POST", SUB_BODY)
        assert code == 201
        assert body["notifId"] == "test-notif-001"
        assert body["nefSubscriptionId"] is None  # outbound NEF omitted
        # pydantic-shaped validation: FastAPI answers 422 on missing fields
        code, _ = _request(base, "/nef/subscriptions", "POST", {"notifId": "x"})
        assert code == 422
        code, body = _request(base, "/nef/subscriptions")
        assert code == 200
        assert [s["notif_id"] for s in body["subscriptions"]] == ["test-notif-001"]
        assert body["subscriptions"][0]["events"] == ["PERF_DATA", "UE_MOBILITY"]
        # delete: 404 unknown id (receiver.py:337-339), then 204, then gone
        code, body = _request(base, "/nef/subscriptions/nope", "DELETE")
        assert (code, body["detail"]) == (404, "Subscription not found")
        code, _ = _request(base, "/nef/subscriptions/test-notif-001", "DELETE")
        assert code == 204
        code, body = _request(base, "/nef/subscriptions")
        assert body["subscriptions"] == []
