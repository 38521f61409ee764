"""despike / winsorize (trailing-window outlier handling) and token_entropy
vs literal Python references."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from pyg_timeseries_spark.operators.clean import despike, winsorize
from pyg_timeseries_spark.textops.vocab import token_entropy


def _series_with_spikes(n=600, seed=47):
    rng = np.random.default_rng(seed)
    v = rng.normal(50, 2, n)
    spikes = rng.choice(n, 12, replace=False)
    v[spikes] += rng.choice([-1, 1], 12) * 200
    pdf = pd.DataFrame(
        {
            "key": [f"k{i % 2}" for i in range(n)],
            "ts": pd.date_range("2024-01-01", periods=n, freq="1min"),
            "v": v,
        }
    )
    pdf.loc[rng.random(n) < 0.1, "v"] = np.nan
    return pdf, set(spikes)


def _ref_despike(pdf, n=20, z=5.0):
    out = {}
    for k, grp in pdf.groupby("key"):
        grp = grp.sort_values("ts")
        vals = grp["v"].to_numpy()
        res = vals.copy()
        valid_hist = []
        for i, x in enumerate(vals):
            if np.isnan(x):
                continue
            win = valid_hist[-n:]
            if len(win) >= n:
                m, s = np.mean(win), np.std(win, ddof=1)
                if s > 0 and abs(x - m) > z * s:
                    res[i] = np.nan
            valid_hist.append(x)
        out[k] = list(zip(grp["ts"], res))
    return out


def test_despike_matches_reference(spark):
    pdf, _ = _series_with_spikes()
    got = (
        despike(spark.createDataFrame(pdf), 20, 5.0)
        .toPandas()
        .sort_values(["key", "ts"])
    )
    ref = _ref_despike(pdf)
    for k, g in got.groupby("key"):
        exp = dict(ref[k])
        for _, row in g.iterrows():
            e = exp[row["ts"]]
            gv = row["despiked"]
            if np.isnan(e) if isinstance(e, float) else False:
                # either input null or removed spike
                assert pd.isna(gv) or not np.isnan(row["v"]), row
                if not pd.isna(row["v"]):
                    assert pd.isna(gv), row
            else:
                assert gv == e or (pd.isna(gv) and pd.isna(row["v"])), row


def test_despike_kills_planted_spikes(spark):
    """Isolated spikes (separated by more than the window, past the
    history gate) are all nulled; adjacent spikes can mask each other —
    that is inherent to mean/std despiking and covered by the parity test."""
    rng = np.random.default_rng(7)
    n = 600
    v = rng.normal(50, 2, n)
    spikes = list(range(100, 600, 90))  # well-separated, past the gate
    for i in spikes:
        v[i] += 300
    pdf = pd.DataFrame(
        {
            "key": ["k"] * n,
            "ts": pd.date_range("2024-01-01", periods=n, freq="1min"),
            "v": v,
        }
    )
    got = despike(spark.createDataFrame(pdf), 20, 5.0).toPandas()
    big = got[got["v"] > 200]
    assert len(big) == len(spikes)
    assert big["despiked"].isna().all()
    normal = got[(got["v"] < 100) & got["v"].notna()]
    assert (normal["despiked"] == normal["v"]).all()


def test_winsorize_clips_not_drops(spark):
    pdf, _ = _series_with_spikes()
    got = winsorize(spark.createDataFrame(pdf), 20, 5.0).toPandas()
    assert got[got["v"].notna()]["winsorized"].notna().all()
    big = got[got["v"].abs() > 150]
    clipped = big[big["winsorized"] != big["v"]]
    assert len(clipped) > 0
    assert (clipped["winsorized"].abs() < clipped["v"].abs()).all()


def test_token_entropy_matches_python(spark):
    from collections import Counter

    pdf = pd.DataFrame(
        {
            "source": ["a", "a", "b"],
            "text": ["x y x z", "x x", "q q q q"],
        }
    )
    got = {
        r["source"]: (r["n_tokens"], r["n_distinct"], r["entropy"])
        for r in token_entropy(spark.createDataFrame(pdf)).collect()
    }
    for src, texts in [("a", ["x y x z", "x x"]), ("b", ["q q q q"])]:
        words = " ".join(texts).split()
        c = Counter(words)
        n = len(words)
        h = -sum((v / n) * np.log(v / n) for v in c.values())
        assert got[src][0] == n
        assert got[src][1] == len(c)
        assert abs(got[src][2] - h) < 1e-12
    assert got["b"][2] == 0.0


def test_xsec_zscore_and_winsorize(spark):
    from pyg_timeseries_spark.operators.xrank import xsec_winsorize, xsec_zscore

    rng = np.random.default_rng(81)
    n_ts, n_keys = 40, 12
    rows = []
    for t in range(n_ts):
        for k in range(n_keys):
            v = rng.normal(10, 3) if rng.random() > 0.1 else np.nan
            rows.append((f"k{k}", pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=t), v))
    pdf = pd.DataFrame(rows, columns=["key", "ts", "v"])
    df = spark.createDataFrame(pdf)

    gz = xsec_zscore(df).toPandas()
    gw = xsec_winsorize(df, z=1.0).toPandas()
    for t, grp in pdf.groupby("ts"):
        vals = grp["v"].dropna()
        m, s = vals.mean(), vals.std(ddof=1)
        sub = gz[gz["ts"] == t].set_index("key")
        for k, v in grp.set_index("key")["v"].items():
            if np.isnan(v):
                assert pd.isna(sub.loc[k, "xsec_zscore"])
            else:
                assert abs(sub.loc[k, "xsec_zscore"] - (v - m) / s) < 1e-12
        subw = gw[gw["ts"] == t].set_index("key")
        for k, v in grp.set_index("key")["v"].items():
            if not np.isnan(v):
                exp = min(max(v, m - s), m + s)
                assert abs(subw.loc[k, "xsec_winsorized"] - exp) < 1e-12
    # zscore of each section: mean 0, std 1
    zz = gz.dropna(subset=["xsec_zscore"]).groupby("ts")["xsec_zscore"]
    assert np.allclose(zz.mean(), 0, atol=1e-10)
    assert np.allclose(zz.std(ddof=1), 1, atol=1e-10)
