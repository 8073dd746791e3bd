"""Pre-trained sklearn model interop (rp_classify.py:110-158 load path,
:66-71 classify path) — loaded WITHOUT sklearn via the restricted
unpickler, re-executed with numpy/Spark."""

import io
import pickle

import numpy as np
import pytest

from rp_extract_spark.sources.sklearn_models import (
    LinearOvRSVM,
    SklearnPickleError,
    _svc_decision,
    classify_vectors,
    load_reference_model,
    load_sklearn_pickle,
)

GTZAN = "/root/reference/models/GTZAN"
GENRES = ["blues", "classical", "country", "disco", "hiphop",
          "jazz", "metal", "pop", "reggae", "rock"]


def test_restricted_unpickler_refuses_code_execution(tmp_path):
    class Evil:
        def __reduce__(self):
            import os
            return (os.system, ("true",))

    p = tmp_path / "evil.pkl"
    p.write_bytes(pickle.dumps(Evil()))
    with pytest.raises(SklearnPickleError, match="refused"):
        load_sklearn_pickle(str(p))


def test_restricted_unpickler_refuses_builtins(tmp_path):
    payload = (b"\x80\x02cbuiltins\neval\nq\x00X\x04\x00\x00\x001+1q\x01"
               b"\x85q\x02Rq\x03.")
    p = tmp_path / "evil2.pkl"
    p.write_bytes(payload)
    with pytest.raises(SklearnPickleError, match="refused"):
        load_sklearn_pickle(str(p))


def test_gtzan_model_loads_with_expected_shape():
    m = load_reference_model(GTZAN)
    assert m.labels == GENRES
    assert m.dim == 228  # ssd (168) + rh (60), the default feature set
    assert m.all_linear
    assert m.coef.shape == (10, 228)
    assert m.intercept.shape == (10,)
    assert m.scaler_mean.shape == (228,)
    assert m.scaler_scale.shape == (228,)


def test_primal_equals_dual_decision():
    """coef_ = dual_coef_ @ SV: the folded primal weights must produce
    the same decision values as evaluating the dual form directly."""
    model = load_sklearn_pickle(GTZAN + ".model.pkl")
    rng = np.random.default_rng(7)
    X = rng.normal(size=(16, 228))
    for est in model.estimators_[:3]:
        primal = X @ (np.asarray(est.dual_coef_)
                      @ np.asarray(est.support_vectors_)).ravel() \
            + float(np.asarray(est.intercept_).ravel()[0])
        dual = _svc_decision(est, X)
        np.testing.assert_allclose(primal, dual, rtol=1e-12)


def test_sign_convention_matches_sklearn_storage():
    """sklearn stores public dual_coef_/intercept_ sign-flipped from
    the private libsvm copies for binary c_svc — the invariant our
    positive->classes_[1] convention rests on."""
    model = load_sklearn_pickle(GTZAN + ".model.pkl")
    for est in model.estimators_:
        np.testing.assert_allclose(np.asarray(est.dual_coef_),
                                   -np.asarray(est._dual_coef_))
        np.testing.assert_allclose(np.asarray(est.intercept_),
                                   -np.asarray(est._intercept_))
        assert list(est.classes_) == [0, 1]


def test_ovr_tie_breaks_to_last_estimator():
    class Fake:
        kernel = b"linear"

    ests = []
    for w in ([1.0, 0.0], [1.0, 0.0], [0.0, -1.0]):
        e = Fake()
        e.support_vectors_ = np.array([w])
        e.dual_coef_ = np.array([[1.0]])
        e.intercept_ = np.array([0.0])
        ests.append(e)
    m = LinearOvRSVM(ests, [0, 1, 2], None)
    # x = (1, 0): estimators 0 and 1 tie at 1.0 -> index 1 wins (sklearn
    # reassigns argmax wherever maxima == current score); x = (-1, -5):
    # estimator 2 wins outright (decision +5 vs -1, -1)
    assert m.predict(np.array([[1.0, 0.0], [-1.0, -5.0]]),
                     scale=False).tolist() == [1, 2]


def test_scaler_and_folded_weights_agree():
    m = load_reference_model(GTZAN)
    rng = np.random.default_rng(11)
    X = rng.normal(loc=5.0, scale=3.0, size=(32, 228))
    via_scaler = m.decision_function(X)  # (x - mean)/scale @ W.T + b
    w, b = m.folded_weights()
    via_folded = X @ w.T + b
    np.testing.assert_allclose(via_scaler, via_folded, rtol=1e-9)
    assert m.predict(X).tolist() == [
        int(np.argmax(row)) for row in via_folded]


def test_rbf_poly_sigmoid_decisions():
    """Kernel decisions for non-linear SVCs (not in the shipped model,
    but the loader supports them): cross-check against a brute-force
    per-row evaluation."""
    rng = np.random.default_rng(3)

    class Fake:
        pass

    sv = rng.normal(size=(5, 4))
    dual = rng.normal(size=(1, 5))
    X = rng.normal(size=(7, 4))
    for kernel, fn in [
        ("rbf", lambda x, s: np.exp(-0.5 * ((x - s) ** 2).sum())),
        ("poly", lambda x, s: (0.5 * (x @ s) + 1.0) ** 3),
        ("sigmoid", lambda x, s: np.tanh(0.5 * (x @ s) + 1.0)),
    ]:
        e = Fake()
        e.kernel = kernel
        e.support_vectors_ = sv
        e.dual_coef_ = dual
        e.intercept_ = np.array([0.25])
        e._gamma = 0.5
        e.coef0 = 1.0
        e.degree = 3
        got = _svc_decision(e, X)
        want = np.array(
            [sum(dual[0, j] * fn(x, sv[j]) for j in range(5)) + 0.25
             for x in X])
        np.testing.assert_allclose(got, want, rtol=1e-10)


def test_classify_vectors_matches_numpy(spark):
    m = load_reference_model(GTZAN)
    rng = np.random.default_rng(23)
    X = rng.normal(loc=2.0, scale=4.0, size=(50, 228))
    expected = m.predict_labels(X)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(50)],
        "id long, features array<double>")
    out = classify_vectors(df, m, "features", "genre", score_col="score")
    rows = {r["id"]: r for r in out.collect()}
    assert [rows[i]["genre"] for i in range(50)] == expected
    dec = m.decision_function(X)
    for i in range(50):
        assert rows[i]["score"] == pytest.approx(dec[i].max(), rel=1e-9)
    assert set(expected) <= set(GENRES)


def test_end_to_end_audio_to_genre(spark):
    """The full reference prediction chain — rp_extract(ssd+rh) ->
    StandardScaler -> OvR linear SVC -> LabelEncoder — on a synthetic
    clip, with the engine's own kernel producing the features."""
    from rp_extract_spark.api import rp_extract

    sr = 22050
    t = np.arange(sr * 6) / sr
    wave = (0.6 * np.sin(2 * np.pi * 220 * t)
            + 0.3 * np.sin(2 * np.pi * 440 * t)
            + 0.1 * np.sign(np.sin(2 * np.pi * 2 * t)))
    feats = rp_extract(wave, sr, extract_ssd=True, extract_rh=True)
    vec = np.concatenate([feats["ssd"], feats["rh"]])  # rp_classify
    # concatenate_features order == feature_types order ['ssd','rh']
    assert vec.shape == (228,)
    m = load_reference_model(GTZAN)
    label = m.predict_labels(vec[None, :])[0]
    assert label in GENRES
    # determinism: same clip, same genre
    assert m.predict_labels(vec[None, :])[0] == label


def test_classify_batch_cli(spark, tmp_path, capsys):
    """rp_classify.py prediction-path analog: WAV dir in, one
    '<file>TAB<genre>' line per clip out, corrupt file isolated."""
    from rp_extract_spark.codecs.wav import encode_wav
    from tools.classify_batch import main

    src = tmp_path / "wavs"
    src.mkdir()
    for i in range(2):
        sr = 11025
        t = np.arange(int(13.0 * sr)) / sr
        x = (0.5 * np.sin(2 * np.pi * (180 + 90 * i) * t)).astype(np.float32)
        (src / f"clip{i}.wav").write_bytes(encode_wav(x, sr, samplewidth=4))
    (src / "broken.wav").write_bytes(b"RIFFgarbage")
    out = tmp_path / "preds.txt"
    rows = main([str(src), GTZAN, str(out), "--cores", "4"])
    assert [cid for cid, _ in rows] == ["clip0.wav", "clip1.wav"]
    assert all(g in GENRES for _, g in rows)
    lines = out.read_text().splitlines()
    assert lines == [f"{cid}\t{g}" for cid, g in rows]
    # same clips, same predictions (deterministic chain)
    assert main([str(src), GTZAN, str(out), "--cores", "4"]) == rows


def test_classify_from_feature_stores(spark, tmp_path):
    """load_or_analyze_features dispatch (rp_feature_io.py:695-745):
    predictions from pre-extracted h5 AND csv feature stores must match
    the direct audio-analysis path on the same clips."""
    from rp_extract_spark.codecs.wav import encode_wav
    from tools.classify_batch import main as classify
    from tools.extract_batch import main as extract

    src = tmp_path / "wavs"
    src.mkdir()
    for i in range(2):
        sr = 11025
        t = np.arange(int(13.0 * sr)) / sr
        x = (0.4 * np.sin(2 * np.pi * (160 + 120 * i) * t)).astype(np.float32)
        (src / f"clip{i}.wav").write_bytes(encode_wav(x, sr, samplewidth=4))
    direct = classify([str(src), GTZAN, "--cores", "4"])
    store = str(tmp_path / "store")
    extract([str(src), store, "--audio", "--h5", "--csv", "--cores", "4"])
    for kind in ("h5", "csv"):
        rows = classify([store, GTZAN, "--cores", "4",
                         "--from-features", kind])
        # extract strips the extension from clip ids; compare by stem
        assert [(c.replace(".wav", ""), g) for c, g in direct] == rows, kind


def test_classify_dim_mismatch_is_loud(spark, tmp_path):
    """Wrong feature set must fail with the reference's dimension
    assertion (rp_classify.py:313-317), not a worker-side shape error."""
    from rp_extract_spark.sources.files import write_csv_features
    from tools.classify_batch import main as classify

    df = spark.createDataFrame(
        [("a", [1.0] * 10), ("b", [2.0] * 10)], "id string, v array<double>")
    store = tmp_path / "store"
    for t in ("ssd", "rh"):
        write_csv_features(df, str(store / f"csv_{t}"), feature="v",
                           id_col="id")
    with pytest.raises(ValueError, match="dimension mismatch.*expects 228"):
        classify([str(store), GTZAN, "--cores", "4", "--from-features", "csv"])
