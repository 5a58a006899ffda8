import glob
import json
import os
from decimal import Decimal

import pytest

REFERENCE = "/root/reference"
TESTDATA = "/root/testdata"


def load_json(path: str):
    with open(path, encoding="utf-8") as f:
        return json.loads(f.read(), parse_float=Decimal)


def make_registry(dialect: str):
    """Registry preloaded like the reference test harness: meta-schemas +
    the remotes/ corpus under http://localhost:1234/ (the reference serves
    those via an embedded HTTP server, RemoteSpecs.scala:49-68; we
    pre-register instead — no network, SURVEY.md §5)."""
    from sparkschema.spec.registry import SpecRegistry

    reg = SpecRegistry(dialect)
    reg.add_schema(
        "http://json-schema.org/draft-04/schema",
        load_json(f"{REFERENCE}/src/main/resources/json-schema-draft-04.json"),
    )
    reg.add_schema(
        "http://json-schema.org/draft-07/schema",
        load_json(f"{REFERENCE}/src/main/resources/json-schema-draft-07.json"),
    )
    base = f"{REFERENCE}/src/test/resources/remotes/"
    for p in glob.glob(base + "**/*.json", recursive=True):
        reg.add_schema("http://localhost:1234/" + os.path.relpath(p, base), load_json(p))
    return reg


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_TEST_CPUS', '4')}]")
        .appName("sparkschema-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    yield spark
    spark.stop()
