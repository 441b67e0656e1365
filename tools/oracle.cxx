// Golden-label oracle driver (test fixture generator ONLY — not part of the
// PySpark engine). Includes the reference headers read-only from
// /root/reference (passed via -I) and runs the *sequential deterministic*
// paths `leidenStatic` / `louvainStatic` (inc/leiden.hxx:1347-1358,
// inc/louvain.hxx equivalents), which — unlike the racy `leidenStaticOmp` —
// produce run-stable per-vertex labels. Dumps (vertex, community) plus
// modularity/passes/iterations so pytest can assert exact-label match and
// modularity allclose(1e-6) against our PySpark engine (SURVEY.md §5.1).
//
// Usage: oracle FILE.mtx [symmetric=0] [weighted=0] [method=leiden]
// Output: one JSON header line, then "<vertex>\t<community>" per vertex.
#include <cstdint>
#include <cstdio>
#include <string>
#include "main.hxx"

using namespace std;

template <class G, class R>
static void dumpResult(const G& x, const R& a, double M) {
  auto fc = [&](auto u) { return a.membership[u]; };
  double Q = modularityBy(x, fc, M, 1.0);
  size_t ncomm = communities(x, a.membership).size();
  printf("{\"modularity\": %.17g, \"passes\": %d, \"iterations\": %d, \"communities\": %zu, \"M\": %.17g}\n",
         Q, a.passes, a.iterations, ncomm, M);
  x.forEachVertexKey([&](auto u) {
    printf("%u\t%u\n", unsigned(u), unsigned(a.membership[u]));
  });
}

int main(int argc, char** argv) {
  using K = uint32_t;
  using V = float;
  if (argc < 2) { fprintf(stderr, "usage: oracle FILE.mtx [symmetric] [weighted] [method]\n"); return 1; }
  char*  file      = argv[1];
  bool   symmetric = argc > 2 ? stoi(argv[2]) : false;
  bool   weighted  = argc > 3 ? stoi(argv[3]) : false;
  string method    = argc > 4 ? argv[4] : "leiden";
  DiGraph<K, None, V> x;
  readMtxW(x, file, weighted);           // sequential parse (inc/mtx.hxx:263-272)
  if (!symmetric) x = symmetricize(x);   // sequential (inc/symmetricize.hxx:55-63)
  double M = edgeWeight(x) / 2;
  if (method == "louvain") { auto a = louvainStatic(x, {1}); dumpResult(x, a, M); }
  else                     { auto a = leidenStatic(x, {1});  dumpResult(x, a, M); }
  return 0;
}
