// Debug tool: dump the reference-loaded (and optionally symmetricized)
// graph adjacency so tests can assert our loader builds the identical graph.
// Usage: dumpgraph FILE.mtx [symmetric=0] [weighted=0]
#include <cstdint>
#include <cstdio>
#include <string>
#include "main.hxx"
using namespace std;

int main(int argc, char** argv) {
  using K = uint32_t;
  using V = float;
  char* file     = argv[1];
  bool symmetric = argc > 2 ? stoi(argv[2]) : false;
  bool weighted  = argc > 3 ? stoi(argv[3]) : false;
  DiGraph<K, None, V> x;
  readMtxW(x, file, weighted);
  if (!symmetric) x = symmetricize(x);
  printf("# span=%zu order=%zu size=%zu edgeWeight=%.17g\n", x.span(), x.order(), x.size(), edgeWeight(x));
  x.forEachVertexKey([&](auto u) {
    x.forEachEdge(u, [&](auto v, auto w) {
      printf("%u\t%u\t%.17g\n", unsigned(u), unsigned(v), double(w));
    });
  });
  return 0;
}
