"""End-to-end ``spark-submit --py-files`` deployment smoke (north-star
deployment surface): build the zip, then run a REAL spark-submit in a
scratch cwd (so the repo itself is not importable) and validate rows
using only the shipped artifact."""

import os
import pathlib
import subprocess
import sys

from sparkschema.deploy import build_pyfiles_zip, submit_command

DRIVER = """
import sys
from pyspark.sql import SparkSession
spark = (SparkSession.builder.getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
# import AFTER the session: --py-files lands on sys.path via spark-submit
from sparkschema.compiler.table import compile_table_spec
df = spark.createDataFrame(
    [("img-000000000001", 64), ("bad", 0), ("img-000000000003", 128)],
    "image_id string, w int")
spec = {"type": "object", "required": ["image_id", "w"],
        "properties": {"image_id": {"pattern": "^img-[0-9]{12}$"},
                       "w": {"minimum": 1}}}
cts = compile_table_spec(spec, df, key_cols=["image_id"])
n = cts.violations(df).count()
print(f"PYFILES_OK {n}")
spark.stop()
"""


def _spark_submit() -> str:
    import pyspark
    cand = pathlib.Path(pyspark.__file__).parent / "bin" / "spark-submit"
    return str(cand) if cand.exists() else "spark-submit"


def test_pyfiles_zip_contains_package(tmp_path):
    z = build_pyfiles_zip(str(tmp_path / "sparkschema.zip"))
    import zipfile
    names = zipfile.ZipFile(z).namelist()
    assert "sparkschema/compiler/columns.py" in names
    assert "sparkschema/spec/interpreter.py" in names
    assert not any("__pycache__" in n or n.endswith(".pyc") for n in names)


def test_submit_command_shape(tmp_path):
    cmd = submit_command("job.py", py_files="/tmp/s.zip", master="yarn",
                         num_executors=1000, executor_cores=4,
                         extra_conf={"spark.sql.shuffle.partitions": "4000"})
    assert cmd[0] == "spark-submit" and cmd[-1] == "job.py"
    assert "--py-files" in cmd and "--num-executors" in cmd


def test_spark_submit_pyfiles_end_to_end(tmp_path):
    z = build_pyfiles_zip(str(tmp_path / "sparkschema.zip"))
    app = tmp_path / "driver_job.py"
    app.write_text(DRIVER)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY source
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    out = subprocess.run(
        [_spark_submit(), "--master", "local[2]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=2",
         "--py-files", z, str(app)],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "PYFILES_OK 2" in out.stdout, (out.stdout[-500:],
                                          out.stderr[-1000:])
