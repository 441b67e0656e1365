#!/usr/bin/env python3
"""One scaling leg with full per-phase metrics dumped — diagnosis harness
for the north-rule efficiency gap (which phases fail to scale N→4N)."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
size = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

from leiden_communities_openmp_spark.session import get_spark

spark = get_spark("profile-" + str(cpus), cpus=cpus, shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")

from leiden_communities_openmp_spark.operators.graphgen import planted_hard
from leiden_communities_openmp_spark.operators.kernel import LeidenOptions
from leiden_communities_openmp_spark.operators.leiden import leiden_scale
from leiden_communities_openmp_spark.sources.edges import symmetricize_df

e = symmetricize_df(planted_hard(spark, size))
e = e.localCheckpoint(eager=True)
n_edges = e.count()
spark.range(100000).repartition(64).mapInPandas(lambda it: it, "id long").count()
t0 = time.time()
res = leiden_scale(spark, e, LeidenOptions(), num_partitions=64)
dt = time.time() - t0
report = {"total": {"cpus": cpus, "edges": n_edges, "seconds": round(dt, 3),
                    "passes": res.passes, "modularity": round(res.modularity, 9)},
          "metrics": res.metrics}
out = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/profile_{cpus}.json"
with open(out, "w") as f:
    json.dump(report, f, indent=1)
print("WROTE", out)
spark.stop()
