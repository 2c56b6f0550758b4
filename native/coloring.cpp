// Greedy graph coloring for sparse-Jacobian compression.
//
// Native equivalent of the reference's coloring machinery
// (reference crates/diffsol/src/jacobian/coloring.rs `nonzeros2graph` +
// greedy_coloring.rs `color_graph_greedy`, built on petgraph): columns of the
// Jacobian that share a nonzero row are connected; a greedy first-fit
// coloring groups structurally-orthogonal columns so each color needs one
// JVP probe.  Runs at problem-setup time on the host; the hot path consumes
// only the resulting color vector.
//
// Exposed as a C ABI for the Python ctypes binding
// (diffsol_tpu/ops/coloring.py).

#include <cstddef>
#include <cstdint>
#include <vector>

using std::size_t;

extern "C" {

// Inputs: nnz nonzeros of an n_rows x n_cols pattern as (rows[k], cols[k]).
// Output: colors[n_cols] (0-based); returns the number of colors used,
// or -1 on invalid input.
int64_t diffsol_greedy_color(const int64_t* rows, const int64_t* cols,
                             int64_t nnz, int64_t n_rows, int64_t n_cols,
                             int64_t* colors) {
  if (n_cols <= 0 || nnz < 0) return -1;

  // rows -> list of columns with a nonzero in that row
  std::vector<std::vector<int64_t>> row_cols(static_cast<size_t>(n_rows));
  for (int64_t k = 0; k < nnz; ++k) {
    int64_t r = rows[k], c = cols[k];
    if (r < 0 || r >= n_rows || c < 0 || c >= n_cols) return -1;
    row_cols[static_cast<size_t>(r)].push_back(c);
  }

  // column adjacency: two columns conflict if they share any row
  std::vector<std::vector<int64_t>> adj(static_cast<size_t>(n_cols));
  for (const auto& rc : row_cols) {
    for (size_t a = 0; a < rc.size(); ++a) {
      for (size_t b = a + 1; b < rc.size(); ++b) {
        adj[static_cast<size_t>(rc[a])].push_back(rc[b]);
        adj[static_cast<size_t>(rc[b])].push_back(rc[a]);
      }
    }
  }

  // greedy first-fit in natural column order (matches the reference's
  // deterministic traversal)
  std::vector<char> used;
  int64_t max_color = 0;
  for (int64_t c = 0; c < n_cols; ++c) colors[c] = -1;
  for (int64_t c = 0; c < n_cols; ++c) {
    used.assign(static_cast<size_t>(max_color) + 2, 0);
    for (int64_t nb : adj[static_cast<size_t>(c)]) {
      int64_t nc = colors[nb];
      if (nc >= 0 && nc < static_cast<int64_t>(used.size())) used[nc] = 1;
    }
    int64_t pick = 0;
    while (used[static_cast<size_t>(pick)]) ++pick;
    colors[c] = pick;
    if (pick + 1 > max_color) max_color = pick + 1;
  }
  return max_color;
}

}  // extern "C"
