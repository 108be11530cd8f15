"""UDF-inference escape hatch (U3) and JDBC config surface (S11)."""

from __future__ import annotations

import sys

from pyspark import cloudpickle

from traffic_forecast_etl_spark.functions.inference import predict_udf
from traffic_forecast_etl_spark.sources.jdbc import JdbcConfig

# this test module is not importable on Spark's python workers —
# ship classes defined here by value (the documented cloudpickle
# pattern for notebook/script-local model classes)
cloudpickle.register_pickle_by_value(sys.modules[__name__])


class LinearModel:
    """Stand-in for any picklable non-MLlib batch predictor."""

    def __init__(self, w):
        self.w = list(w)

    def predict(self, X):
        return X @ self.w


def test_predict_udf_vectorized(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 2.0), (2, 3.0, 4.0), (3, -1.0, 0.5)], "id int, a double, b double"
    )
    out = predict_udf(df, LinearModel([2.0, 10.0]), ["a", "b"])
    got = {r.id: r.prediction for r in out.collect()}
    assert got == {1: 22.0, 2: 46.0, 3: 3.0}


def test_predict_udf_casts_ints(spark):
    df = spark.createDataFrame([(1, 5, True)], "id int, a int, b boolean")
    out = predict_udf(df, LinearModel([1.0, 100.0]), ["a", "b"])
    assert out.collect()[0].prediction == 105.0


def test_jdbc_config_from_ini(tmp_path):
    ini = tmp_path / "database.ini"
    ini.write_text(
        "[postgresql]\nhost=db.example\nport=5433\ndatabase=traffic\n"
        "user=etl\npassword=secret\n"
    )
    cfg = JdbcConfig.from_ini(str(ini))
    assert cfg.url == "jdbc:postgresql://db.example:5433/traffic"
    opts = cfg.options()
    assert opts["user"] == "etl" and opts["driver"] == "org.postgresql.Driver"
