// Three-edge-connected components — behavioral twin of the reference's
// Norouzi & Tsin (2014) implementation (reference
// three_edge_connected_components.hpp, itself based on Adam Novak's vg
// implementation): iterative DFS with absorb-eject path merging, bridge-edge
// censoring, and the same traversal order (neighbors = previous then next,
// consumed from the back), so the merge-graph edge insertion order and the
// final component enumeration order (connected_components.hpp DFS from
// ascending start ids) match the reference exactly.

#include <cstdint>
#include <vector>
#include <algorithm>

namespace {
using i64 = int64_t;
constexpr i64 NONE = -1;
}

extern "C" {

// graph as directed CSRs (next + previous adjacency, multigraph allowed).
// out_comp: (V,) component id per node, ids in reference enumeration order.
// Returns the number of components.
i64 three_edge_connected_components(
        i64 V, const i64* nptr, const i64* nind, const i64* pptr,
        const i64* pind, i64* out_comp) {
    struct Node {
        i64 dfs_counter = 0;
        i64 dfs_exit = 0;
        i64 low_point = 0;
        i64 effective_degree = 0;
        i64 path_tail = NONE;
        bool is_on_path = false;
        bool visited = false;
    };
    struct Frame {
        i64 current;
        std::vector<i64> neighbors;
        bool saw_parent_tree_edge = false;
        bool recursing = false;
    };

    std::vector<Node> nodes(V);
    // merge graph as an undirected edge list (built in insertion order)
    std::vector<std::pair<i64, i64>> merge_edges;

    auto absorb_all_along_path = [&](i64 into, i64 path_start,
                                     i64 path_past_end) {
        i64 here = path_start;
        while (here != path_past_end) {
            if (here == NONE) break;  // edge-free null path
            Node& here_node = nodes[here];
            if (here_node.is_on_path) {
                if (into == NONE) {
                    into = here;
                } else {
                    nodes[into].effective_degree =
                        nodes[into].effective_degree +
                        here_node.effective_degree - 2;
                    merge_edges.emplace_back(into, here);
                }
            }
            here = here_node.path_tail;
        }
    };

    std::vector<Frame> stack;
    i64 next_unvisited = 0;
    i64 dfs_counter = 1;

    while (next_unvisited != V) {
        stack.emplace_back();
        stack.back().current = !nodes[0].visited ? 0 : next_unvisited;

        while (!stack.empty()) {
            Frame& frame = stack.back();
            Node& node = nodes[frame.current];

            if (!node.visited) {
                node.visited = true;
                if (frame.current == next_unvisited) {
                    do {
                        ++next_unvisited;
                    } while (next_unvisited != V &&
                             nodes[next_unvisited].visited);
                }
                node.dfs_counter = dfs_counter++;
                node.low_point = node.dfs_counter;
                node.path_tail = NONE;
                node.is_on_path = true;
                for (i64 k = pptr[frame.current]; k < pptr[frame.current + 1];
                     ++k)
                    frame.neighbors.push_back(pind[k]);
                for (i64 k = nptr[frame.current]; k < nptr[frame.current + 1];
                     ++k)
                    frame.neighbors.push_back(nind[k]);
                continue;
            }
            if (!frame.neighbors.empty()) {
                i64 neighbor_number = frame.neighbors.back();
                Node& neighbor = nodes[neighbor_number];
                if (!frame.recursing) {
                    node.effective_degree++;
                    if (!neighbor.visited) {
                        frame.recursing = true;
                        stack.emplace_back();
                        stack.back().current = neighbor_number;
                        // note: frame/node references invalidated
                    } else {
                        if (stack.size() > 1 &&
                            neighbor_number == stack[stack.size() - 2].current &&
                            !frame.saw_parent_tree_edge) {
                            frame.saw_parent_tree_edge = true;
                        } else if (neighbor.dfs_counter < node.dfs_counter) {
                            if (neighbor.dfs_counter < node.low_point) {
                                absorb_all_along_path(NONE, frame.current,
                                                      NONE);
                                node.low_point = neighbor.dfs_counter;
                                node.is_on_path = true;
                                node.path_tail = NONE;
                            }
                        } else if (node.dfs_counter < neighbor.dfs_counter) {
                            node.effective_degree -= 2;
                            i64 repl = frame.current;
                            i64 cand = nodes[repl].path_tail;
                            while (cand != NONE &&
                                   nodes[cand].dfs_counter <=
                                       neighbor.dfs_counter &&
                                   nodes[cand].dfs_exit >= neighbor.dfs_exit) {
                                repl = cand;
                                cand = nodes[repl].path_tail;
                            }
                            absorb_all_along_path(NONE, frame.current,
                                                  nodes[repl].path_tail);
                            node.path_tail = nodes[repl].path_tail;
                        } else {
                            node.effective_degree--;  // self loop
                        }
                        frame.neighbors.pop_back();
                    }
                } else {
                    if (neighbor.low_point == neighbor.dfs_counter) {
                        // bridge edge: censor
                        neighbor.effective_degree--;
                        node.effective_degree--;
                    } else {
                        if (neighbor.effective_degree == 2) {
                            neighbor.is_on_path = false;
                        }
                        if (node.low_point <= neighbor.low_point) {
                            absorb_all_along_path(frame.current,
                                                  neighbor_number, NONE);
                        } else {
                            node.low_point = neighbor.low_point;
                            absorb_all_along_path(NONE, frame.current, NONE);
                            node.is_on_path = true;
                            node.path_tail = neighbor_number;
                        }
                    }
                    frame.recursing = false;
                    frame.neighbors.pop_back();
                }
            } else {
                node.dfs_exit = dfs_counter;
                stack.pop_back();
            }
        }
    }

    // connected components of the merge graph (connected_components.hpp:11):
    // DFS from ascending start ids, previous- then next-edges, stack popped
    // from the back. The merge graph is undirected here, so we build both
    // adjacency directions in insertion order.
    std::vector<std::vector<i64>> prev_adj(V), next_adj(V);
    for (const auto& e : merge_edges) {
        next_adj[e.first].push_back(e.second);
        prev_adj[e.second].push_back(e.first);
    }
    std::vector<bool> traversed(V, false);
    i64 n_comp = 0;
    std::vector<i64> dfs;
    for (i64 start = 0; start < V; ++start) {
        if (traversed[start]) continue;
        dfs.assign(1, start);
        traversed[start] = true;
        while (!dfs.empty()) {
            i64 v = dfs.back();
            dfs.pop_back();
            out_comp[v] = n_comp;
            for (i64 u : prev_adj[v]) {
                if (!traversed[u]) {
                    traversed[u] = true;
                    dfs.push_back(u);
                }
            }
            for (i64 u : next_adj[v]) {
                if (!traversed[u]) {
                    traversed[u] = true;
                    dfs.push_back(u);
                }
            }
        }
        ++n_comp;
    }
    return n_comp;
}

}  // extern "C"
