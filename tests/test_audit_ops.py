"""Round-11 audit_ops family (second batch): each query's semantics
checked against an independent pandas/numpy ground truth at sf0.001 (the
oracle hash-parity is the driver's job; these tests pin the MATH - the
oracle and builder could agree and both be wrong)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from pei_nwdaf_data_ingestion_spark import registry
from pei_nwdaf_data_ingestion_spark.catalog import load

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _reg():
    registry.load_all()


def _events(spark) -> pd.DataFrame:
    return load(spark, SF, "events").toPandas()


def _docs(spark) -> pd.DataFrame:
    return load(spark, SF, "documents").toPandas()


def _daily_grid_pd(ev: pd.DataFrame) -> pd.DataFrame:
    """Independent restatement of the densified integer-dollar daily grid."""
    ev = ev.copy()
    ev["d"] = ev.ts.dt.floor("D")
    g = ev.groupby(["event_type", "d"]).value.sum().reset_index()
    g["cents"] = np.floor(g.value * 100.0 + 0.5).astype(np.int64)
    frames = []
    for et, sub in g.groupby("event_type"):
        days = pd.date_range(sub.d.min(), sub.d.max(), freq="D")
        s = sub.set_index("d").cents.reindex(days, fill_value=0)
        frames.append(
            pd.DataFrame(
                {
                    "event_type": et,
                    "day": days.strftime("%Y-%m-%d"),
                    "amt": s.values // 100,
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


class TestTukeyFences:
    def test_matches_numpy(self, spark):
        got = (
            registry.QUERIES["agg_tukey_fences"](spark, SF)
            .toPandas()
            .set_index("event_type")
        )
        ev = _events(spark)
        ev = ev[ev.value.notna()]
        cents = np.floor(ev.value.values * 100.0).astype(np.int64)
        for et in got.index:
            c = cents[(ev.event_type == et).values]
            q1 = np.quantile(c, 0.25, method="linear")
            q3 = np.quantile(c, 0.75, method="linear")
            iqr = q3 - q1
            lo, hi = q1 - 1.5 * iqr, q3 + 1.5 * iqr
            row = got.loc[et]
            assert row.n == len(c)
            assert row.q1_c == q1 and row.q3_c == q3 and row.iqr_c == iqr
            assert row.n_low == int((c < lo).sum())
            assert row.n_high == int((c > hi).sum())
            assert row.outlier_milli == (row.n_low + row.n_high) * 1000 // len(c)

    def test_fences_are_exact_binary_fractions(self, spark):
        """The cents quantization guarantees quartiles land on quarter-
        integers - the whole point of quantize-then-interpolate."""
        got = registry.QUERIES["agg_tukey_fences"](spark, SF).toPandas()
        assert ((got.q1_c * 4) % 1 == 0).all()
        assert ((got.q3_c * 4) % 1 == 0).all()


class TestWeightedSample:
    def test_matches_python_reference(self, spark):
        got = registry.QUERIES["pipeline_weighted_sample"](spark, SF).toPandas()
        d = _docs(spark)
        d = d[d.n_chars > 0]
        h = d.doc_id.map(
            lambda i: int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16)
        )
        u = (h + 0.5) / float(1 << 48)
        key = np.floor(np.log(u.values) / d.n_chars.values * 1e9).astype(
            np.int64
        )
        ref = pd.DataFrame(
            {"doc_id": d.doc_id.values, "lang": d.lang.values, "key": key}
        )
        for lang, sub in ref.groupby("lang"):
            top = sub.sort_values(
                ["key", "doc_id"], ascending=[False, True]
            ).head(20)
            got_l = got[got.lang == lang].sort_values("rk")
            assert list(got_l.doc_id) == list(top.doc_id)
            assert list(got_l.key_nano) == list(top.key)
            assert list(got_l.rk) == list(range(1, len(got_l) + 1))

    def test_weight_monotonicity(self, spark):
        """Same hash digit stream, longer doc -> ln(u)/w closer to zero,
        i.e. heavier docs are favored: verify selection probability is
        weight-driven by checking the sampled mean weight exceeds the
        stratum mean weight (Efraimidis-Spirakis property; holds for the
        fixture's spread of n_chars)."""
        got = registry.QUERIES["pipeline_weighted_sample"](spark, SF).toPandas()
        d = _docs(spark)
        d = d[d.n_chars > 0]
        pop = d.n_chars.mean()
        # small strata are noisy: assert on the pooled sample
        assert got.n_chars.mean() > pop * 0.95


class TestRSIMomentum:
    def test_matches_pandas_rolling(self, spark):
        got = registry.QUERIES["win_rsi_momentum"](spark, SF).toPandas()
        daily = _daily_grid_pd(_events(spark))
        refs = []
        for et, sub in daily.groupby("event_type"):
            sub = sub.sort_values("day").reset_index(drop=True)
            delta = sub.amt.diff()
            gain = delta.clip(lower=0)
            loss = (-delta).clip(lower=0)
            sg = gain.rolling(14, min_periods=1).sum()
            sl = loss.rolling(14, min_periods=1).sum()
            cnt = delta.notna().rolling(14, min_periods=1).sum()
            ok = cnt == 14
            for i in np.flatnonzero(ok.values):
                g_, l_ = int(sg.iloc[i]), int(sl.iloc[i])
                rsi = g_ * 100000 // (g_ + l_) if g_ + l_ > 0 else None
                refs.append((et, sub.day.iloc[i], g_, l_, rsi))
        ref = pd.DataFrame(
            refs, columns=["event_type", "day", "sg", "sl", "rsi_milli"]
        )
        m = got.sort_values(["event_type", "day"]).reset_index(drop=True)
        r = ref.sort_values(["event_type", "day"]).reset_index(drop=True)
        assert len(m) == len(r)
        assert (m.event_type == r.event_type).all() and (m.day == r.day).all()
        assert (m.sg == r.sg).all() and (m.sl == r.sl).all()
        assert m.rsi_milli.fillna(-1).eq(r.rsi_milli.fillna(-1)).all()
        assert m.rsi_milli.dropna().between(0, 100000).all()


class TestPACF:
    def test_matches_durbin_levinson(self, spark):
        got = (
            registry.QUERIES["time_pacf_lags"](spark, SF)
            .toPandas()
            .set_index("event_type")
        )
        daily = _daily_grid_pd(_events(spark))
        for et, sub in daily.groupby("event_type"):
            x = sub.sort_values("day").amt.values.astype(object)

            def r_at(L):
                a, b = x[L:], x[:-L]
                n = len(a)
                sx, sy = sum(a), sum(b)
                sxy = sum(int(p) * int(q) for p, q in zip(a, b))
                sxx = sum(int(p) * int(p) for p in a)
                syy = sum(int(q) * int(q) for q in b)
                dx, dy = n * sxx - sx * sx, n * syy - sy * sy
                if dx <= 0 or dy <= 0:
                    return None
                return float(n * sxy - sx * sy) / math.sqrt(
                    float(dx) * float(dy)
                )

            r1, r2, r3 = r_at(1), r_at(2), r_at(3)
            row = got.loc[et]
            assert row.pacf1_micro == math.floor(r1 * 1e6)
            phi22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
            assert row.pacf2_micro == math.floor(phi22 * 1e6)
            phi21 = r1 - phi22 * r1
            den3 = 1.0 - phi21 * r1 - phi22 * r2
            phi33 = (r3 - phi21 * r2 - phi22 * r1) / den3
            assert row.pacf3_micro == math.floor(phi33 * 1e6)
            # PACF lag 1 == ACF lag 1 by construction; all in [-1, 1]
            for v in (row.pacf1_micro, row.pacf2_micro, row.pacf3_micro):
                assert -1000000 <= v <= 1000000


class TestClusteringCoeff:
    def test_edge_iterator_and_wedge_regimes_agree(self, spark, monkeypatch):
        """r15: under the broadcast gate the per-node triangle credits
        come from the edge-iterator (|I| to both endpoints + explode(I)
        - no wedge enumeration); past the gate the ordered two-join
        wedge spelling is the 100 TB fallback.  Both regimes must
        produce the identical bucket table."""
        from pei_nwdaf_data_ingestion_spark.queries import corpus_ops

        fast = registry.QUERIES["graph_clustering_coeff"](spark, SF).collect()
        monkeypatch.setattr(corpus_ops, "TRI_BCAST_CAP", 0)
        slow = registry.QUERIES["graph_clustering_coeff"](spark, SF).collect()
        assert sorted(map(tuple, fast)) == sorted(map(tuple, slow))
        monkeypatch.setattr(corpus_ops, "TRI_BCAST_CAP", 2_000_000)
        monkeypatch.setattr(corpus_ops, "TRI_MAX_DEG_CAP", 0)
        degslow = registry.QUERIES["graph_clustering_coeff"](spark, SF).collect()
        assert sorted(map(tuple, fast)) == sorted(map(tuple, degslow))
        assert len(fast) > 0

    def test_matches_set_arithmetic(self, spark):
        got = (
            registry.QUERIES["graph_clustering_coeff"](spark, SF)
            .toPandas()
            .set_index("deg_bucket")
        )
        li = load(spark, SF, "lineitem").toPandas()
        li = li[["l_orderkey", "l_partkey"]].drop_duplicates()
        pairs: dict[tuple[int, int], int] = {}
        for _, sub in li.groupby("l_orderkey"):
            ps = sorted(sub.l_partkey)
            for i in range(len(ps)):
                for j in range(i + 1, len(ps)):
                    pairs[(ps[i], ps[j])] = pairs.get((ps[i], ps[j]), 0) + 1
        edges = {e for e, c in pairs.items() if c >= 2}
        adj: dict[int, set[int]] = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        rows = []
        for v, nb in adj.items():
            deg = len(nb)
            if deg < 2:
                continue
            nbl = sorted(nb)
            tri = sum(
                1
                for i in range(len(nbl))
                for j in range(i + 1, len(nbl))
                if nbl[j] in adj.get(nbl[i], ())
            )
            rows.append((min(9, deg - 2), tri, tri * 2000 // (deg * (deg - 1))))
        ref = pd.DataFrame(rows, columns=["b", "tri", "cc"])
        for b, sub in ref.groupby("b"):
            row = got.loc[b]
            assert row.n_nodes == len(sub)
            assert row.sum_tri == sub.tri.sum()
            assert row.avg_cc_milli == sub.cc.sum() // len(sub)
            assert row.min_cc_milli == sub.cc.min()
            assert row.max_cc_milli == sub.cc.max()
        assert set(got.index) == set(ref.b.unique())


class TestCEMATT:
    def test_matches_pandas_strata(self, spark):
        got = registry.QUERIES["events_cem_att"](spark, SF).toPandas()
        ev = _events(spark)
        ev = ev[ev.value.notna()].copy()
        ev["cents"] = np.floor(ev.value * 100.0).astype(np.int64)
        ev["is_p"] = (ev.event_type == "purchase").astype(int)
        u = ev.groupby("user_id").agg(
            n_events=("cents", "size"),
            sum_cents=("cents", "sum"),
            purch_cnt=("is_p", "sum"),
        )
        u["purch_cents"] = ev[ev.is_p == 1].groupby("user_id").cents.sum()
        u["purch_cents"] = u.purch_cents.fillna(0).astype(np.int64)
        u["treated"] = [
            hashlib.md5(str(i).encode()).hexdigest()[0] in "0123"
            for i in u.index
        ]
        u["cov_spend"] = np.minimum(9, (u.sum_cents // u.n_events) // 5000)
        u["cov_mix"] = u.purch_cnt * 4 // u.n_events
        ref = []
        for (cs, cm), sub in u.groupby(["cov_spend", "cov_mix"]):
            t, c = sub[sub.treated], sub[~sub.treated]
            if len(t) == 0 or len(c) == 0:
                continue
            att = int(t.purch_cents.sum()) * 1000 // len(t) - int(
                c.purch_cents.sum()
            ) * 1000 // len(c)
            ref.append((cs, cm, len(t), len(c), att))
        ref_df = pd.DataFrame(
            ref, columns=["cov_spend", "cov_mix", "n_t", "n_c", "att_millicents"]
        ).sort_values(["cov_spend", "cov_mix"]).reset_index(drop=True)
        g = got.sort_values(["cov_spend", "cov_mix"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            g.astype("int64"), ref_df.astype("int64"), check_dtype=False
        )


class TestRRFFusion:
    def test_matches_python_fusion(self, spark):
        got = registry.QUERIES["sim_rrf_fusion"](spark, SF).toPandas()
        d = _docs(spark)
        toks = {r.doc_id: str(r.text).split(" ") for r in d.itertuples()}
        tf: dict[tuple[int, str], int] = {}
        for did, ts in toks.items():
            for t in ts:
                tf[(did, t)] = tf.get((did, t), 0) + 1
        dl = {did: len(ts) for did, ts in toks.items()}
        df_: dict[str, int] = {}
        for (did, t) in tf:
            df_[t] = df_.get(t, 0) + 1
        n_docs, sumlen = len(dl), sum(dl.values())
        q = set(toks[0])
        bm: dict[int, int] = {}
        for (did, t), f in tf.items():
            if did == 0 or t not in q:
                continue
            idf = math.log(1.0 + (n_docs - df_[t] + 0.5) / (df_[t] + 0.5))
            s = idf * (f * 2.2) / (
                f + 1.2 * (0.25 + 0.75 * dl[did] / (sumlen * 1.0 / n_docs))
            )
            bm[did] = bm.get(did, 0) + int(math.floor(s * 1e6 + 0.5))
        bpool = sorted(bm.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
        rk_b = {did: i + 1 for i, (did, _) in enumerate(bpool)}
        e = load(spark, SF, "embeddings").toPandas()
        vecs = {
            r.vec_id: np.asarray(r.embedding, dtype=np.float64)
            for r in e.itertuples()
            if r.embedding is not None
        }
        av = vecs[0]
        cosm: dict[int, int] = {}
        for vid, v in vecs.items():
            if vid == 0:
                continue
            den = math.sqrt(float(v @ v)) * math.sqrt(float(av @ av))
            if den == 0:
                continue
            cosm[vid] = int(math.floor(float(v @ av) / den * 1e6 + 0.5))
        dpool = sorted(cosm.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
        rk_d = {did: i + 1 for i, (did, _) in enumerate(dpool)}
        fused = {}
        for did in set(rk_b) | set(rk_d):
            s = 0
            if did in rk_b:
                s += 1000000000 // (60 + rk_b[did])
            if did in rk_d:
                s += 1000000000 // (60 + rk_d[did])
            fused[did] = s
        top = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        assert list(got.doc_id) == [d_ for d_, _ in top]
        assert list(got.rrf_nano) == [s for _, s in top]
        for r in got.itertuples():
            assert (r.rk_bm25 if not pd.isna(r.rk_bm25) else None) == rk_b.get(
                r.doc_id
            )
            assert (
                r.rk_dense if not pd.isna(r.rk_dense) else None
            ) == rk_d.get(r.doc_id)


class TestNDCGAudit:
    def test_matches_numpy(self, spark):
        got = (
            registry.QUERIES["sim_ndcg_audit"](spark, SF)
            .toPandas()
            .set_index("a_id")
        )
        e = load(spark, SF, "embeddings").toPandas()
        vecs = {
            r.vec_id: np.asarray(r.embedding, dtype=np.float64)
            for r in e.itertuples()
            if r.embedding is not None
        }
        codes = {}
        for vid, v in vecs.items():
            nrm = math.sqrt(float(v @ v))
            codes[vid] = np.floor(v / nrm * 127.0 + 0.5) if nrm > 0 else None
        ln2 = math.log(2.0)
        for a_id in got.index:
            av, aq = vecs[a_id], codes[a_id]
            ce, cq = {}, {}
            for vid, v in vecs.items():
                if vid == a_id:
                    continue
                d1 = math.sqrt(float(v @ v)) * math.sqrt(float(av @ av))
                qv = codes[vid]
                if d1 == 0 or qv is None or aq is None:
                    continue
                d2 = math.sqrt(float(qv @ qv)) * math.sqrt(float(aq @ aq))
                if d2 == 0:
                    continue
                ce[vid] = float(v @ av) / d1
                cq[vid] = float(qv @ aq) / d2
            rk_e = {
                vid: i + 1
                for i, vid in enumerate(
                    sorted(ce, key=lambda k: (-ce[k], k))
                )
            }
            rk_q = {
                vid: i + 1
                for i, vid in enumerate(
                    sorted(cq, key=lambda k: (-cq[k], k))
                )
            }
            rel = {v: 11 - rk_e[v] if rk_e[v] <= 10 else 0 for v in rk_e}
            dcg = sum(
                math.floor(rel[v] * 1e6 / (math.log(rk_q[v] + 1) / ln2))
                for v in rk_q
                if rk_q[v] <= 10
            )
            idcg = sum(
                math.floor(rel[v] * 1e6 / (math.log(rk_e[v] + 1) / ln2))
                for v in rk_e
                if rk_e[v] <= 10
            )
            hits = sum(1 for v in rk_q if rk_q[v] <= 10 and rk_e[v] <= 10)
            row = got.loc[a_id]
            assert row.n_hits == hits
            assert row.dcg_micro == dcg
            assert row.idcg_micro == idcg
            assert row.ndcg_milli == dcg * 1000 // idcg
            assert 0 <= row.ndcg_milli <= 1000


class TestImageSharpness:
    def test_matches_pixel_formula(self, spark):
        got = (
            registry.QUERIES["multimodal_image_sharpness"](spark, SF)
            .toPandas()
            .set_index("asset_id")
        )
        d = _docs(spark)
        img_ids = [i for i in d.doc_id if i % 3 == 0]
        assert set(got.index) == set(img_ids)
        for did in img_ids:
            n = (4 + did % 5) * (2 + did % 3) * 3
            px = [(did * 37 + i * 11) % 256 for i in range(n)]
            grads = [px[i] - px[i - 1] for i in range(1, n)]
            row = got.loc[did]
            assert row.n_px == n
            assert row.grad_energy == sum(g * g for g in grads)
            assert row.sharpness_q == sum(g * g for g in grads) // (n - 1)
            assert row.max_abs_grad == max(abs(g) for g in grads)


class TestStochasticOscillator:
    def test_matches_pandas_rolling(self, spark):
        got = registry.QUERIES["win_stochastic_oscillator"](spark, SF).toPandas()
        daily = _daily_grid_pd(_events(spark))
        refs = []
        for et, sub in daily.groupby("event_type"):
            sub = sub.sort_values("day").reset_index(drop=True)
            lo = sub.amt.rolling(14).min()
            hi = sub.amt.rolling(14).max()
            k = pd.Series(
                [
                    (sub.amt[i] - lo[i]) * 1000 // (hi[i] - lo[i])
                    if hi[i] > lo[i]
                    else np.nan
                    for i in range(len(sub))
                ]
            )
            k[lo.isna()] = np.nan  # partial windows excluded
            for i in range(len(sub)):
                if pd.isna(lo[i]):
                    continue
                k3 = k[max(0, i - 2): i + 1]
                # only rows INSIDE the emitted frame count toward %D
                k3 = k3[
                    [j for j in k3.index if not pd.isna(lo[j])]
                ].dropna()
                d = int(k3.sum()) // 3 if len(k3) == 3 else None
                refs.append(
                    (
                        et,
                        sub.day[i],
                        int(lo[i]),
                        int(hi[i]),
                        None if pd.isna(k[i]) else int(k[i]),
                        d,
                    )
                )
        ref = pd.DataFrame(
            refs,
            columns=["event_type", "day", "lo14", "hi14", "k_milli", "d_milli"],
        )
        m = got.sort_values(["event_type", "day"]).reset_index(drop=True)
        r = ref.sort_values(["event_type", "day"]).reset_index(drop=True)
        assert len(m) == len(r)
        assert (m.lo14 == r.lo14).all() and (m.hi14 == r.hi14).all()
        assert m.k_milli.fillna(-1).eq(r.k_milli.fillna(-1)).all()
        assert m.d_milli.fillna(-1).eq(r.d_milli.fillna(-1)).all()
        assert m.k_milli.dropna().between(0, 1000).all()


class TestAssortativity:
    def test_matches_numpy_pearson(self, spark):
        got = registry.QUERIES["graph_assortativity"](spark, SF).toPandas()
        assert len(got) == 1
        row = got.iloc[0]
        li = load(spark, SF, "lineitem").toPandas()
        li = li[["l_orderkey", "l_partkey"]].drop_duplicates()
        pairs: dict[tuple[int, int], int] = {}
        for _, sub in li.groupby("l_orderkey"):
            ps = sorted(sub.l_partkey)
            for i in range(len(ps)):
                for j in range(i + 1, len(ps)):
                    pairs[(ps[i], ps[j])] = pairs.get((ps[i], ps[j]), 0) + 1
        edges = [e for e, c in pairs.items() if c >= 2]
        deg: dict[int, int] = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        xs = [deg[a] for a, b in edges] + [deg[b] for a, b in edges]
        ys = [deg[b] for a, b in edges] + [deg[a] for a, b in edges]
        assert row.n_edges == len(edges)
        assert row.n_nodes == len(deg)
        if len(set(xs)) > 1:
            r = np.corrcoef(xs, ys)[0, 1]
            assert abs(row.assort_micro / 1e6 - r) < 2e-6
        # symmetrized marginals: r in [-1, 1] exactly
        if row.assort_micro is not None and not pd.isna(row.assort_micro):
            assert -1000000 <= row.assort_micro <= 1000000


class TestCramersV:
    def test_matches_scipy_free_chi2(self, spark):
        got = registry.QUERIES["agg_cramers_v"](spark, SF).toPandas()
        assert len(got) == 1
        row = got.iloc[0]
        ev = _events(spark)
        ev = ev[ev.value.notna()]
        a = ev.event_type
        b = np.minimum(9, np.floor(ev.value / 50.0)).astype(int)
        ct = pd.crosstab(a, b).values.astype(float)
        n = ct.sum()
        exp = np.outer(ct.sum(1), ct.sum(0)) / n
        chi2 = float(((ct - exp) ** 2 / exp)[ct + exp > 0].sum())
        assert row.n_r == ct.shape[0] and row.n_c == ct.shape[1]
        assert row.n_obs == int(n)
        # per-cell micro floors: within n_cells micro of the float value
        assert abs(row.chi2_micro / 1e6 - chi2) < ct.size * 1e-6 + 1e-6
        v = math.sqrt(chi2 / (n * (min(ct.shape) - 1)))
        assert abs(row.cramers_v_milli / 1000.0 - v) < 2e-3
        assert 0 <= row.cramers_v_milli <= 1000


class TestTrimmedMean:
    def test_matches_numpy(self, spark):
        got = (
            registry.QUERIES["agg_trimmed_mean"](spark, SF)
            .toPandas()
            .set_index("event_type")
        )
        ev = _events(spark)
        ev = ev[ev.value.notna()]
        cents = np.floor(ev.value.values * 100.0 + 0.5).astype(np.int64)
        for et in got.index:
            c = np.sort(cents[(ev.event_type == et).values])
            n = len(c)
            k = n * 5 // 100
            kept = c[k: n - k]
            row = got.loc[et]
            assert row.n == n
            assert row.n_trimmed == 2 * k
            assert row.n_kept == n - 2 * k
            assert row.trimmed_sum_cents == int(kept.sum())
            assert row.trimmed_mean_cents == int(kept.sum()) // len(kept)

    def test_trim_is_at_most_winsorize_spread(self, spark):
        """Trimmed and raw means bracket sanity: trimming removes equal
        counts from both tails, so the trimmed mean sits between the
        group's 5th and 95th percentile (loose but engine-independent)."""
        got = registry.QUERIES["agg_trimmed_mean"](spark, SF).toPandas()
        ev = _events(spark)
        ev = ev[ev.value.notna()]
        for r in got.itertuples():
            vals = ev[ev.event_type == r.event_type].value * 100
            lo, hi = np.percentile(vals, [5, 95])
            assert lo - 1 <= r.trimmed_mean_cents <= hi + 1


class TestGeometricMean:
    def test_matches_numpy_and_am_gm(self, spark):
        got = (
            registry.QUERIES["agg_geometric_mean"](spark, SF)
            .toPandas()
            .set_index("event_type")
        )
        ev = _events(spark)
        ev = ev[(ev.value.notna()) & (ev.value > 0)]
        cents = np.floor(ev.value.values * 100.0 + 0.5).astype(np.int64)
        keep = cents >= 1
        ev, cents = ev[keep], cents[keep]
        for et in got.index:
            c = cents[(ev.event_type == et).values]
            gm = math.exp(float(np.mean(np.log(c.astype(float)))))
            row = got.loc[et]
            assert row.n == len(c)
            # per-row micro ln floors bias the log-mean down by < 1e-6:
            # the floored GM sits within ~gm*2e-6 + 1 cent of the float GM
            assert abs(row.geo_mean_cents - gm) <= gm * 2e-6 + 1.0
            assert row.arith_mean_cents == int(c.sum()) // len(c)
            # AM >= GM always (strict for non-constant series)
            assert row.am_gm_gap_cents >= 0
            assert (
                row.am_gm_gap_cents
                == row.arith_mean_cents - row.geo_mean_cents
            )
