import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MTX_DIR = os.path.join(REPO, "tests", "data", "mtx")
GOLD_DIR = os.path.join(REPO, "tests", "golden")


@pytest.fixture(scope="session")
def spark():
    from leiden_communities_openmp_spark.session import get_spark

    s = get_spark("pytest", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
                  shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def load_golden(name: str, method: str):
    import json
    import pathlib

    lines = pathlib.Path(os.path.join(GOLD_DIR, f"{name}.{method}.txt")).read_text().splitlines()
    hdr = json.loads(lines[0])
    memb = {int(a): int(b) for a, b in (ln.split("\t") for ln in lines[1:])}
    return hdr, memb
