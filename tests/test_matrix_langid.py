"""Matrix EWM operators (ewmAAi / ewmGLM) and language-ID accuracy."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from pyg_timeseries_spark.kernels import matrix_numpy as MK
from pyg_timeseries_spark.operators.matrix import ewmAAi, ewmAAi_, ewmGLM


def test_ewmGLM_recovers_betas():
    rng = np.random.default_rng(0)
    t, m = 2000, 3
    dA = rng.normal(0, 1, (t, m))
    A = dA.cumsum(axis=0)
    true_m = np.array([2.0, -1.0, 0.5])
    b = (dA @ true_m).cumsum()
    res, _ = MK.ewmGLM(A, b, 50)
    assert np.allclose(res[-1], true_m, atol=1e-6)


def test_ewmAAi_inverse_property():
    rng = np.random.default_rng(1)
    t, m = 3000, 3
    dA = rng.normal(0, 1, (t, m))
    A = dA.cumsum(axis=0)
    res, _ = MK.ewmAAi(A, 100)
    # E(dA'dA) → identity covariance for iid N(0,1); inverse ≈ identity
    assert np.allclose(res[-1], np.eye(m), atol=0.35)


def test_matrix_state_split():
    rng = np.random.default_rng(2)
    A = rng.normal(0, 1, (500, 2)).cumsum(axis=0)
    full, _ = MK.ewmAAi(A, 20)
    head, s = MK.ewmAAi(A[:200], 20)
    tail, _ = MK.ewmAAi(A[200:], 20, state=s)
    glued = np.concatenate([head, tail])
    assert np.array_equal(glued, full, equal_nan=True)

    b = rng.normal(0, 1, 500).cumsum()
    fullg, _ = MK.ewmGLM(A, b, 20)
    headg, sg = MK.ewmGLM(A[:200], b[:200], 20)
    tailg, _ = MK.ewmGLM(A[200:], b[200:], 20, state=sg)
    assert np.array_equal(np.concatenate([headg, tailg]), fullg, equal_nan=True)


def test_matrix_spark_wrappers(spark):
    rng = np.random.default_rng(3)
    t = 300
    dA = rng.normal(0, 1, (t, 2))
    A = dA.cumsum(axis=0)
    b = (dA @ np.array([1.0, -2.0])).cumsum()
    pdf = pd.DataFrame({
        "key": "k0",
        "ts": pd.date_range("2024-01-01", periods=t, freq="1min"),
        "features": list(A),
        "v": b,
    })
    df = spark.createDataFrame(pdf)
    out = ewmGLM(df, 30).toPandas().sort_values("ts")
    last = np.array(out["betas"].iloc[-1])
    assert np.allclose(last, [1.0, -2.0], atol=1e-6)

    data, state = ewmAAi_(df, 30)
    assert state.count() == 1
    aai = data.toPandas().sort_values("ts")["aai"].iloc[-1]
    assert len(aai) == 4  # 2x2 flattened

    # spark-level resume
    cut = pdf["ts"].iloc[150]
    head = df.filter(F.col("ts") < F.lit(cut))
    tail = df.filter(F.col("ts") >= F.lit(cut))
    _, st = ewmAAi_(head, 30)
    resumed = ewmAAi(tail, 30, state_df=st).toPandas().sort_values("ts")
    fullp = ewmAAi(df, 30).toPandas().sort_values("ts")
    fullp = fullp[fullp.ts >= resumed.ts.min()]
    for ra, fa in zip(resumed["aai"], fullp["aai"]):
        if ra is None or fa is None:
            assert ra == fa
        else:
            assert np.array_equal(np.array(ra), np.array(fa))


def test_lang_id_heuristic(spark):
    """The testdata's `lang` labels sit on identical English-ish word salad
    (not inferable from content), so accuracy is validated on genuine
    per-language sentences instead."""
    from pyg_timeseries_spark.textops.analysis import lang_id

    samples = [
        ("en", "the cat sat on the mat and it was happy for a while"),
        ("en", "this is that house of the man who was there for it"),
        ("de", "der Hund und die Katze sind nicht mit dem Mann auf der Straße"),
        ("de", "das ist ein Haus mit einem Garten und das ist nicht klein"),
        ("fr", "le chat et la souris sont dans la maison des voisins que nous aimons"),
        ("fr", "il est une fois une histoire du roi et des reines qui ne dorment pas"),
        ("es", "el perro y la gata están en la casa con los niños para jugar"),
        ("es", "es una historia de los reyes por una tierra con mucha agua"),
        ("zh", "这是一个关于猫和狗的故事它们住在一个小房子里非常开心"),
    ]
    df = spark.createDataFrame(pd.DataFrame(samples, columns=["lang", "text"]))
    pred = lang_id(df).toPandas()
    acc = (pred["lang"] == pred["pred_lang"]).mean()
    assert acc == 1.0, pred[["lang", "pred_lang"]].to_string()


def test_ewmcorr_psd_properties():
    from pyg_timeseries_spark.functions.psd import min_eigenvalue

    rng = np.random.default_rng(8)
    t, m = 600, 5
    common = rng.normal(0, 1, (t, 1))
    A = 0.5 * common + rng.normal(0, 1, (t, m))
    A[rng.random((t, m)) < 0.1] = np.nan
    res, state = MK.ewmcorr_psd(A, 64)
    # PSD on every date where fully populated
    for i in range(100, t, 100):
        C = res[i]
        if not np.isnan(C).any():
            assert min_eigenvalue(C) >= -1e-9, i
            assert np.allclose(np.diag(C), 1.0)
    # state split is bit-exact
    full, _ = MK.ewmcorr_psd(A, 64)
    head, s = MK.ewmcorr_psd(A[:250], 64)
    tail, _ = MK.ewmcorr_psd(A[250:], 64, state=s)
    assert np.array_equal(np.concatenate([head, tail]), full, equal_nan=True)


def test_ewmcorr_psd_spark(spark):
    from pyg_timeseries_spark.operators.matrix import ewmcorr_psd

    rng = np.random.default_rng(9)
    t, m = 200, 3
    A = rng.normal(0, 1, (t, m))
    pdf = pd.DataFrame({
        "key": "k0",
        "ts": pd.date_range("2024-01-01", periods=t, freq="1min"),
        "features": list(A),
    })
    out = ewmcorr_psd(spark.createDataFrame(pdf), 32).toPandas().sort_values("ts")
    last = np.array(out["psd_cor"].iloc[-1]).reshape(m, m)
    assert np.allclose(np.diag(last), 1.0)
    assert np.allclose(last, last.T)


def test_overlapping_rows_reference_vector():
    """Matrix form of the overlapping_returns docstring vector
    (reference _ewm_psd.py:28-33)."""
    a = np.array([np.nan, np.nan, 1., 2., np.nan, 3., np.nan, np.nan,
                  np.nan, np.nan]).reshape(-1, 1)
    X, tail = MK.overlapping_rows(a, 3)
    exp = np.array([np.nan, np.nan, 1, 3, 3, 5, 3, 3, np.nan, np.nan])
    assert np.array_equal(X.ravel(), exp, equal_nan=True)
    assert tail.shape == (2, 1)


def test_ewmcorr_psd_overlapping_state_split():
    rng = np.random.default_rng(12)
    t, m = 400, 3
    A = 0.4 * rng.normal(0, 1, (t, 1)) + rng.normal(0, 1, (t, m))
    A[rng.random((t, m)) < 0.1] = np.nan
    full, _ = MK.ewmcorr_psd_ov(A, 32, overlapping=4)
    head, s = MK.ewmcorr_psd_ov(A[:150], 32, overlapping=4)
    tail_res, _ = MK.ewmcorr_psd_ov(A[150:], 32, overlapping=4, state=s)
    glued = np.concatenate([head, tail_res])
    assert np.array_equal(glued, full, equal_nan=True)
    # overlapping=1 reduces to the plain kernel
    a1, s1 = MK.ewmcorr_psd_ov(A, 32, overlapping=1)
    a0, s0 = MK.ewmcorr_psd(A, 32)
    assert np.array_equal(a1, a0, equal_nan=True)


def test_ewmAAi_glm_overlapping_state_split():
    """overlapping>1: k-step valid-row differences; resume bit-exact with
    the shift-register ring riding the state; overlapping=1 unchanged."""
    import numpy as np

    from pyg_timeseries_spark.kernels import matrix_numpy as MK

    rng = np.random.default_rng(21)
    A = rng.normal(0, 1, (300, 3)).cumsum(axis=0)
    A[rng.random((300, 3)) > 2.5] = np.nan  # no missing → also test with:
    A[rng.random(300) < 0.1] = np.nan       # whole-row gaps
    b = (A @ np.array([0.5, -1.0, 2.0]))
    b = np.where(np.isnan(b), 0.0, b) + rng.normal(0, 0.1, 300)

    # overlapping=1 equals the old single-step behavior by construction
    r1, s1 = MK.ewmAAi(A, 10, overlapping=1)
    assert len(s1) == MK.aai_state_len(3, 1)

    for k in (2, 3):
        full, fs = MK.ewmAAi(A, 10, overlapping=k)
        h, s = MK.ewmAAi(A[:137], 10, overlapping=k)
        t, s2 = MK.ewmAAi(A[137:], 10, state=s, overlapping=k)
        assert np.array_equal(np.concatenate([h, t]), full, equal_nan=True), k
        assert np.array_equal(s2, fs, equal_nan=True), k

        gfull, gfs = MK.ewmGLM(A, b, 10, overlapping=k)
        gh, gs = MK.ewmGLM(A[:137], b[:137], 10, overlapping=k)
        gt, gs2 = MK.ewmGLM(A[137:], b[137:], 10, state=gs, overlapping=k)
        assert np.array_equal(np.concatenate([gh, gt]), gfull, equal_nan=True), k
        assert np.array_equal(gs2, gfs, equal_nan=True), k

    # k=2 actually differs from k=1 (it is a different estimator)
    r2, _ = MK.ewmAAi(A, 10, overlapping=2)
    both = ~(np.isnan(r1) | np.isnan(r2))
    assert (r1[both] != r2[both]).any()
