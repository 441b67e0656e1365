"""Registry/driver-gate drift guard (round-3 verdict, 'What's wrong' #1).

The correctness bar is: every key in queries() gets a green row in the
DRIVER's CORRECTNESS_r*.json in the same round it is registered. Round 3
shipped 53 registered queries against a 50-row driver file because the
registry changed after the sweep. This test makes that drift loud at
commit time: a key may be absent from the latest driver file ONLY if it is
explicitly declared in REGISTERED_THIS_ROUND (new this round, locally
gate-checked via tools/check_oracles.py before registration).
"""

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_correctness():
    files = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    assert files, "no driver correctness file found"
    with open(files[-1]) as f:
        return files[-1], json.load(f)


def test_every_registered_query_is_gate_covered_or_declared_new():
    from leiden_communities_openmp_spark.queries import QUERIES, REGISTERED_THIS_ROUND

    path, rows = _latest_correctness()
    undeclared = set(QUERIES) - set(rows) - REGISTERED_THIS_ROUND
    assert not undeclared, (
        f"queries registered without a row in {os.path.basename(path)} and "
        f"not declared in REGISTERED_THIS_ROUND: {sorted(undeclared)} — "
        "run tools/check_oracles.py on them and declare them, or register "
        "them before the round's correctness sweep"
    )


def test_no_registered_query_has_a_red_driver_row():
    from leiden_communities_openmp_spark.queries import QUERIES

    path, rows = _latest_correctness()
    red = []
    for k, r in rows.items():
        if k not in QUERIES:
            continue  # deregistered since that sweep
        if r.get("err") or not (r.get("rows_match") and r.get("schema_match")
                                and r.get("hash_match", True)):
            red.append(k)
    assert not red, f"registered queries with red rows in {os.path.basename(path)}: {red}"


def test_declared_new_keys_are_actually_registered():
    from leiden_communities_openmp_spark.queries import QUERIES, REGISTERED_THIS_ROUND

    ghosts = REGISTERED_THIS_ROUND - set(QUERIES)
    assert not ghosts, (
        f"REGISTERED_THIS_ROUND declares keys that are not in QUERIES: "
        f"{sorted(ghosts)}"
    )
