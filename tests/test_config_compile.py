"""Reference-shape JSON config -> compiled check suite. Config dicts here
use the same schema as the reference's configuration/*.json (algorithm
name strings + parameter dicts, README.md:68-92) but are authored
fresh — no data copied."""

import pytest

from anomaly_detection_spark.config import (
    UnsupportedAlgorithm,
    compile_config,
    compile_detector,
)
from tests.conftest import series_df


def test_border_config_ladder(spark):
    cfg = {
        "anomaly_detection_alg": ["BorderCheck()"],
        "anomaly_detection_conf": [{
            "input_vector_size": 1,
            "warning_stages": [0.9],
            "UL": 4.0, "LL": 0.0,
        }],
    }
    df = series_df(spark, [2.0, 3.9, 4.5, -1.0, 2.0])
    out = compile_config(cfg)(df).orderBy("ts").collect()
    assert [r["code_0_bordercheck"] for r in out] == [1, 0, -1, -1, 1]
    assert [r["status_code"] for r in out] == [1, 0, -1, -1, 1]


def test_multi_detector_or_combination(spark):
    cfg = {
        "anomaly_detection_alg": ["BorderCheck()", "Welford()"],
        "anomaly_detection_conf": [
            {"warning_stages": [], "UL": 100.0, "LL": 0.0},
            {"warning_stages": [], "N": 3, "X": 2.0},
        ],
    }
    vals = [10.0, 11, 10, 12, 11, 10, 80, 11]  # 80 in border but a z-outlier
    df = series_df(spark, vals)
    out = compile_config(cfg)(df).orderBy("ts").collect()
    border = [r["code_0_bordercheck"] for r in out]
    welford = [r["code_1_welford"] for r in out]
    combined = [r["status_code"] for r in out]
    assert border == [1] * 8                      # all inside [0, 100]
    assert welford[:3] == [2, 2, 2] and welford[6] == -1
    assert combined[6] == -1                       # OR: any error wins
    assert combined[0] == 1                        # Undefined doesn't win min


def test_sequential_detectors_from_config(spark):
    vals = [10.0, 12, 11, 13, 12, 11, 10, 12, 11, 13]
    df = series_df(spark, vals)
    for alg, conf in [
        ("EMA()", {"N": 3, "LL": 0.0, "UL": 40.0, "warning_stages": [0.9]}),
        ("MACD()", {"period1": 2, "period2": 5, "LL": -10.0, "UL": 10.0,
                    "warning_stages": []}),
        ("Cumulative()", {"averaging": 3, "decay": 0.1,
                          "warning_stages": [0.5]}),
        ("Hampel()", {"W": 2, "n_sigmas": 3.0, "K": 1.4826}),
        ("LinearFit()", {"N": 4, "LL": -5.0, "UL": 5.0,
                         "warning_stages": []}),
        ("Filtering()", {"filter_order": 3, "cutoff_frequency": 0.4,
                         "mode": 0, "LL": 0.0, "UL": 40.0,
                         "warning_stages": []}),
    ]:
        t = compile_detector(alg, conf, keys="series", order="ts",
                             value="value")
        out = t(df)
        assert out.count() == len(vals), alg
        assert "code" in out.columns, alg


def test_unsupported_algorithms_raise(spark):
    for alg in ["GAN()", "RRCF_trees()", "fb_Prophet()"]:
        with pytest.raises(UnsupportedAlgorithm):
            compile_detector(alg, {}, keys="series", order="ts",
                             value="value")


def test_config_from_file(spark, tmp_path):
    import json

    p = tmp_path / "suite.json"
    p.write_text(json.dumps({
        "anomaly_detection_alg": ["BorderCheck()"],
        "anomaly_detection_conf": [{"UL": 1.0, "LL": -1.0,
                                    "warning_stages": []}],
    }))
    df = series_df(spark, [0.0, 2.0])
    out = compile_config(str(p))(df).orderBy("ts").collect()
    assert [r["status_code"] for r in out] == [1, -1]


def test_reference_csv_source_end_to_end(spark, tmp_path):
    """CSV in the reference's file format -> source reader -> config-
    compiled suite -> verdicts: the full 'switch your pipeline over' path."""
    from anomaly_detection_spark.sources.files import read_reference_csv

    p = tmp_path / "series.csv"
    lines = ["timestamp,value,label,labelInfo"]
    base = 1459926000
    vals = [1.0, 1.0, 1.0, 1.0, 5.0, 1.0]
    for i, v in enumerate(vals):
        lines.append(f"{base + i * 3600},{v},0,")
    p.write_text("\n".join(lines) + "\n")

    df = read_reference_csv(spark, str(p))
    assert df.columns == ["series", "ts", "ftr_vector", "value"]
    assert df.count() == len(vals)
    # label columns are gone; ms-vs-s promotion gives sane years
    years = [r["y"] for r in df.selectExpr("year(ts) AS y").collect()]
    assert all(y == 2016 for y in years)

    cfg = {
        "anomaly_detection_alg": ["BorderCheck()"],
        "anomaly_detection_conf": [{"UL": 4.0, "LL": 0.0,
                                    "warning_stages": [0.9]}],
    }
    out = compile_config(cfg)(df).orderBy("ts").collect()
    assert [r["status_code"] for r in out] == [1, 1, 1, 1, -1, 1]


def test_reference_json_source(spark, tmp_path):
    import json

    from anomaly_detection_spark.sources.files import read_reference_json

    p = tmp_path / "series.json"
    p.write_text(json.dumps({"data": [
        {"timestamp": 1459926000, "ftr_vector": [1.0, 2.0]},
        {"timestamp": 1459926000123.0, "ftr_vector": [3.0, 4.0]},  # ms
    ]}))
    df = read_reference_json(spark, str(p)).orderBy("ts").collect()
    assert [r["value"] for r in df] == [1.0, 3.0]
    assert [len(r["ftr_vector"]) for r in df] == [2, 2]
    # ms timestamp promoted to the same wall-clock second
    assert abs((df[1]["ts"] - df[0]["ts"]).total_seconds()) < 1.0


def test_cli_config_mode(spark, tmp_path, capsys):
    """python -m anomaly_detection_spark.run --config ... --data ... ==
    the reference's `main.py -f -c conf.json` workflow."""
    import json as _json

    from anomaly_detection_spark.run import main

    cfg = tmp_path / "suite.json"
    cfg.write_text(_json.dumps({
        "anomaly_detection_alg": ["BorderCheck()"],
        "anomaly_detection_conf": [{"UL": 4.0, "LL": 0.0,
                                    "warning_stages": []}],
    }))
    data = tmp_path / "s.csv"
    lines = ["timestamp,value,label,labelInfo"]
    for i, (v, l) in enumerate([(1.0, 0), (1.1, 0), (9.0, 1), (0.9, 0)]):
        lines.append(f"{1459926000 + i * 60},{v},{l},")
    data.write_text("\n".join(lines) + "\n")
    out = tmp_path / "verdicts"

    rc = main(["--config", str(cfg), "--data", str(data),
               "--evaluate", "label", "--output", str(out), "--json"])
    assert rc == 0
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["rows"] == 4 and res["errors"] == 1 and res["f1"] == 1.0
    import glob
    assert glob.glob(str(out) + "/*.parquet")
