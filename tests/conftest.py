import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

REFERENCE = "/root/reference"
FIXTURE_INPUTS = os.path.join(REFERENCE, "examples", "inputs")
FIXTURE_SCRPS = os.path.join(REFERENCE, "examples", "scrps")
FIXTURE_SNAPS = os.path.join(REFERENCE, "examples", "outputs")


def load_fixture(name: str) -> tuple[str, str, str]:
    """(html, scrp, golden_json_body) for a reference golden case."""
    with open(os.path.join(FIXTURE_INPUTS, f"{name}.html")) as f:
        html = f.read()
    with open(os.path.join(FIXTURE_SCRPS, f"{name}.scrp")) as f:
        scrp = f.read()
    with open(os.path.join(FIXTURE_SNAPS, f"{name}.snap")) as f:
        snap = f.read()
    # strip the insta header (--- ... --- block)
    body = snap.split("---", 2)[2].lstrip("\n")
    return html, scrp, body


_SPARK = None


@pytest.fixture(scope="session")
def spark():
    """Shared local SparkSession for all Spark tests."""
    global _SPARK
    if _SPARK is None:
        from scrapelect_spark.session import get_spark

        _SPARK = get_spark(app_name="scrapelect-spark-tests")
    return _SPARK
