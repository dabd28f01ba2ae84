// Multi-vehicle routing solver for the coverage expert controller.
//
// Native replacement for the reference's OR-Tools dependency
// (reference gym_flock/envs/spatial/vrp_solver.py:61-162 builds a
// pywrapcp.RoutingModel with PATH_CHEAPEST_ARC first solution, per-node drop
// penalties, and a max route-duration dimension).  Same problem formulation:
//
//   * nodes 0..n-1 where 0 is a virtual depot; every vehicle starts and ends
//     at the depot;
//   * time_matrix[(n)x(n)] arc costs (depot row = 0 cost only to each
//     vehicle's initial location, reference vrp_solver.py:45-51);
//   * penalties[i] — cost of NOT visiting node i (500 * need_to_visit,
//     reference :30-32); zero-penalty nodes are droppable for free;
//   * max_route_time — per-vehicle time budget (the routing "Time" dimension,
//     reference :97-102).
//
// Algorithm: cheapest-arc route construction (each vehicle repeatedly
// extends with the globally cheapest feasible (vehicle, node) arc among
// penalized nodes — the spirit of PATH_CHEAPEST_ARC), followed by bounded
// 2-opt intra-route and relocate inter-route improvement.  Exact OR-Tools
// tie-break parity is out of scope (the reference driver catches expert
// infeasibility and resets, test.py:53-59); route *validity* invariants are
// preserved and tested from Python.
//
// Build: g++ -O3 -shared -fPIC -o libvrp.so vrp_solver.cc

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <cmath>
#include <limits>
#include <vector>

namespace {

struct Problem {
  int n;  // node count including depot 0
  int num_vehicles;
  double max_time;
  const double* cost;      // n*n row-major
  const double* penalties; // n

  double arc(int a, int b) const { return cost[a * n + b]; }
};

double route_time(const Problem& p, const std::vector<int>& route) {
  // depot -> route[0] -> ... -> route[k-1] (return to depot is free:
  // to_depot column is zero, reference vrp_solver.py:48)
  double t = 0.0;
  int prev = 0;
  for (int node : route) {
    t += p.arc(prev, node);
    prev = node;
  }
  return t;
}

// Cheapest-arc construction over penalized nodes.
void construct(const Problem& p, const std::vector<int>& init_loc,
               std::vector<std::vector<int>>& routes) {
  std::vector<char> visited(p.n, 0);
  visited[0] = 1;

  routes.assign(p.num_vehicles, {});
  std::vector<double> used(p.num_vehicles, 0.0);
  std::vector<int> last(p.num_vehicles, 0);

  // First stops: each vehicle claims its own initial location (the depot row
  // has zero cost exactly there; the reference asserts first stops are
  // distinct init locations, vrp_solver.py:144-145).
  for (int v = 0; v < p.num_vehicles; ++v) {
    int node = init_loc[v];
    if (node <= 0 || node >= p.n) continue;
    routes[v].push_back(node);
    used[v] += p.arc(0, node);
    last[v] = node;
    visited[node] = 1;
  }

  // Greedy cheapest-arc extension among nodes worth visiting.
  while (true) {
    double best = std::numeric_limits<double>::infinity();
    int best_v = -1, best_node = -1;
    for (int v = 0; v < p.num_vehicles; ++v) {
      for (int node = 1; node < p.n; ++node) {
        if (visited[node] || p.penalties[node] <= 0.0) continue;
        double a = p.arc(last[v], node);
        if (used[v] + a > p.max_time) continue;
        // prefer cheaper arcs; tie-break by vehicle then node index
        if (a < best) {
          best = a;
          best_v = v;
          best_node = node;
        }
      }
    }
    if (best_v < 0) break;
    routes[best_v].push_back(best_node);
    used[best_v] += best;
    last[best_v] = best_node;
    visited[best_node] = 1;
  }
}

// Regret-2 insertion construction: each round, for every unrouted node
// compute the best and second-best insertion delta over all routes and
// positions; insert the node with the largest regret (best2 - best1) at its
// best position.  Looks one assignment ahead of pure cheapest insertion and
// noticeably reduces route crossings on clustered coverage maps.
void construct_regret(const Problem& p, const std::vector<int>& init_loc,
                      std::vector<std::vector<int>>& routes) {
  std::vector<char> visited(p.n, 0);
  visited[0] = 1;
  routes.assign(p.num_vehicles, {});
  for (int v = 0; v < p.num_vehicles; ++v) {
    int node = init_loc[v];
    if (node <= 0 || node >= p.n) continue;
    routes[v].push_back(node);
    visited[node] = 1;
  }

  auto insertion_delta = [&](const std::vector<int>& route, size_t pos,
                             int node) {
    int prev = (pos == 0) ? 0 : route[pos - 1];
    double removed = (pos < route.size()) ? p.arc(prev, route[pos]) : 0.0;
    double added = p.arc(prev, node) +
                   ((pos < route.size()) ? p.arc(node, route[pos]) : 0.0);
    return added - removed;
  };

  while (true) {
    double best_regret = -1.0;
    double chosen_best = 0.0;
    int chosen_node = -1, chosen_v = -1;
    size_t chosen_pos = 0;
    for (int node = 1; node < p.n; ++node) {
      if (visited[node] || p.penalties[node] <= 0.0) continue;
      double best1 = std::numeric_limits<double>::infinity();
      double best2 = std::numeric_limits<double>::infinity();
      int best_v = -1;
      size_t best_pos = 0;
      for (int v = 0; v < p.num_vehicles; ++v) {
        double rt = route_time(p, routes[v]);
        // first stop pinned: insertion positions start at 1
        for (size_t pos = 1; pos <= routes[v].size(); ++pos) {
          double d = insertion_delta(routes[v], pos, node);
          if (rt + d > p.max_time) continue;
          if (d < best1) {
            best2 = best1;
            best1 = d;
            best_v = v;
            best_pos = pos;
          } else if (d < best2) {
            best2 = d;
          }
        }
      }
      if (best_v < 0) continue;  // doesn't fit anywhere
      double regret =
          std::isinf(best2) ? 1e18 - best1 : best2 - best1;  // forced moves first
      if (regret > best_regret) {
        best_regret = regret;
        chosen_node = node;
        chosen_v = best_v;
        chosen_pos = best_pos;
        chosen_best = best1;
      }
    }
    (void)chosen_best;
    if (chosen_node < 0) break;
    routes[chosen_v].insert(routes[chosen_v].begin() + chosen_pos, chosen_node);
    visited[chosen_node] = 1;
  }
}

// OR-Tools PATH_CHEAPEST_ARC first-solution construction, exact semantics
// (reference vrp_solver.py:115-134 selects FirstSolutionStrategy::
// PATH_CHEAPEST_ARC; OR-Tools docs: "Starting from a route 'start' node,
// connect it to the node which produces the cheapest route segment, then
// extend the route by iterating on the last node added to the route"):
//
//   * vehicles are processed in index order, each route extended to
//     completion before the next starts;
//   * every extension appends the cheapest feasible arc from the route's
//     last node over ALL unrouted nodes (not only penalized ones — OR-Tools
//     considers free-droppable nodes as successors too), ties broken by
//     lowest node index (OR-Tools sorts (value, node) pairs);
//   * arc costs are truncated to int64 exactly as the SWIG transit callback
//     does (all values in this formulation are integral, so truncation is
//     the identity);
//   * an extension is feasible when the route's cumulative time + arc stays
//     within max_time (the 'Time' dimension cap, reference :97-102); the
//     return-to-depot arc is free (to_depot column, reference :48).
//
// The depot row prices init locations at 0 and everything else at 100000
// (reference :45-47), so with max_time < 100000 each vehicle's first stop is
// automatically the lowest-indexed unclaimed init location — no special
// casing, the same emergent behavior as OR-Tools.
//
// NOTE on label-exactness: the reference calls SolveWithParameters with
// DEFAULT search parameters, so OR-Tools ALSO runs greedy-descent local
// search on top of this construction before returning.  This mode
// reproduces the deterministic construction (the part VERDICT/ROADMAP track
// as PATH_CHEAPEST_ARC semantics); the post-hoc local-search polish is not
// reproducible without an OR-Tools oracle in the environment and is
// documented as a residual difference.
void construct_cheapest_arc_exact(const Problem& p,
                                  std::vector<std::vector<int>>& routes) {
  std::vector<char> routed(p.n, 0);
  routed[0] = 1;
  routes.assign(p.num_vehicles, {});
  const long long budget = (long long)p.max_time;
  for (int v = 0; v < p.num_vehicles; ++v) {
    long long used = 0;
    int last = 0;  // every vehicle starts at the depot
    while (true) {
      long long best = std::numeric_limits<long long>::max();
      int best_node = -1;
      for (int node = 1; node < p.n; ++node) {
        if (routed[node]) continue;
        long long a = (long long)p.arc(last, node);  // int64 cast (SWIG)
        if (used + a > budget) continue;
        if (a < best) {  // strict: ties keep the lowest node index
          best = a;
          best_node = node;
        }
      }
      if (best_node < 0) break;  // close the route (end arc is free)
      routes[v].push_back(best_node);
      routed[best_node] = 1;
      used += best;
      last = best_node;
    }
  }
}

double total_time(const Problem& p, const std::vector<std::vector<int>>& routes,
                  int* n_served) {
  double t = 0.0;
  int served = 0;
  for (const auto& r : routes) {
    t += route_time(p, r);
    served += (int)r.size();
  }
  if (n_served) *n_served = served;
  return t;
}

// Or-opt: relocate chains of 2..3 consecutive stops to the cheapest position
// on any route (first stops pinned).
void or_opt(const Problem& p, std::vector<std::vector<int>>& routes) {
  int guard = 0;
  bool improved = true;
  while (improved && guard++ < 10) {
    improved = false;
    for (int v1 = 0; v1 < p.num_vehicles; ++v1) {
      for (int seg = 2; seg <= 3; ++seg) {
        for (size_t i = 1; i + seg <= routes[v1].size(); ++i) {
          std::vector<int> chain(routes[v1].begin() + i,
                                 routes[v1].begin() + i + seg);
          std::vector<int> without = routes[v1];
          without.erase(without.begin() + i, without.begin() + i + seg);
          double base_gain =
              route_time(p, routes[v1]) - route_time(p, without);
          double best_delta = 1e-9;
          int best_v = -1;
          size_t best_pos = 0;
          for (int v2 = 0; v2 < p.num_vehicles; ++v2) {
            const std::vector<int>& target =
                (v2 == v1) ? without : routes[v2];
            for (size_t pos = 1; pos <= target.size(); ++pos) {
              std::vector<int> cand = target;
              cand.insert(cand.begin() + pos, chain.begin(), chain.end());
              double t_new = route_time(p, cand);
              if (t_new > p.max_time) continue;
              double add = t_new - route_time(p, target);
              double delta = base_gain - add;
              if (delta > best_delta) {
                best_delta = delta;
                best_v = v2;
                best_pos = pos;
              }
            }
          }
          if (best_v >= 0) {
            routes[v1] = without;
            std::vector<int>& tgt = (best_v == v1) ? routes[v1] : routes[best_v];
            tgt.insert(tgt.begin() + best_pos, chain.begin(), chain.end());
            improved = true;
          }
        }
      }
    }
  }
}

// 2-opt within a route (first stop pinned — it is the vehicle's position).
void two_opt(const Problem& p, std::vector<int>& route) {
  if (route.size() < 4) return;
  bool improved = true;
  int guard = 0;
  while (improved && guard++ < 50) {
    improved = false;
    for (size_t i = 1; i + 1 < route.size(); ++i) {
      for (size_t j = i + 1; j < route.size(); ++j) {
        int a = route[i - 1], b = route[i];
        int c = route[j], d = (j + 1 < route.size()) ? route[j + 1] : -1;
        double before = p.arc(a, b) + (d >= 0 ? p.arc(c, d) : 0.0);
        double after = p.arc(a, c) + (d >= 0 ? p.arc(b, d) : 0.0);
        if (after + 1e-9 < before) {
          std::reverse(route.begin() + i, route.begin() + j + 1);
          improved = true;
        }
      }
    }
  }
}

// Relocate: move a single stop to the cheapest position on any route if that
// lowers total time and keeps every route within budget.
void relocate(const Problem& p, std::vector<std::vector<int>>& routes) {
  int guard = 0;
  bool improved = true;
  while (improved && guard++ < 20) {
    improved = false;
    for (int v1 = 0; v1 < p.num_vehicles; ++v1) {
      for (size_t i = 1; i < routes[v1].size(); ++i) {  // first stop pinned
        int node = routes[v1][i];
        std::vector<int> without = routes[v1];
        without.erase(without.begin() + i);
        double base_gain = route_time(p, routes[v1]) - route_time(p, without);
        double best_delta = -1e-9;
        int best_v = -1;
        size_t best_pos = 0;
        for (int v2 = 0; v2 < p.num_vehicles; ++v2) {
          const std::vector<int>& target = (v2 == v1) ? without : routes[v2];
          for (size_t pos = 1; pos <= target.size(); ++pos) {
            std::vector<int> cand = target;
            cand.insert(cand.begin() + pos, node);
            double add = route_time(p, cand) - route_time(p, target);
            double t_new = route_time(p, cand);
            if (t_new > p.max_time) continue;
            double delta = base_gain - add;
            if (delta > best_delta) {
              best_delta = delta;
              best_v = v2;
              best_pos = pos;
            }
          }
        }
        if (best_v >= 0 && best_delta > 1e-9) {
          routes[v1] = without;
          std::vector<int>& tgt = (best_v == v1) ? routes[v1] : routes[best_v];
          tgt.insert(tgt.begin() + best_pos, node);
          improved = true;
        }
      }
    }
  }
}

}  // namespace

extern "C" {

// Solve; writes routes into out (num_vehicles rows x max_len, -1 terminated).
// Returns 0 on success, negative on error.
int vrp_solve(const double* time_matrix, const double* penalties, int n_nodes,
              int num_vehicles, const int* init_loc, double max_route_time,
              int32_t* out, int max_len) {
  if (n_nodes <= 1 || num_vehicles <= 0) return -1;
  Problem p{n_nodes, num_vehicles, max_route_time, time_matrix, penalties};

  std::vector<int> init(init_loc, init_loc + num_vehicles);

  // run both constructions, improve each, keep whichever serves more nodes
  // (primary objective: drop penalties) with lower total time as tie-break
  auto improve = [&](std::vector<std::vector<int>>& routes) {
    for (auto& r : routes) two_opt(p, r);
    relocate(p, routes);
    or_opt(p, routes);
    for (auto& r : routes) two_opt(p, r);
  };

  std::vector<std::vector<int>> routes_arc, routes_reg;
  construct(p, init, routes_arc);
  improve(routes_arc);
  construct_regret(p, init, routes_reg);
  improve(routes_reg);

  int served_arc = 0, served_reg = 0;
  double t_arc = total_time(p, routes_arc, &served_arc);
  double t_reg = total_time(p, routes_reg, &served_reg);
  std::vector<std::vector<int>>& routes =
      (served_reg > served_arc || (served_reg == served_arc && t_reg < t_arc))
          ? routes_reg
          : routes_arc;

  for (int v = 0; v < num_vehicles; ++v) {
    int len = std::min<int>(routes[v].size(), max_len - 1);
    for (int i = 0; i < len; ++i) out[v * max_len + i] = routes[v][i];
    out[v * max_len + len] = -1;
  }
  return 0;
}

// PATH_CHEAPEST_ARC construction only (no improvement passes): the
// deterministic, label-reproducible mode — see construct_cheapest_arc_exact.
// init_loc is unused (first stops emerge from the depot-row pricing) but
// kept for interface symmetry with vrp_solve.
int vrp_solve_cheapest_arc(const double* time_matrix, const double* penalties,
                           int n_nodes, int num_vehicles, const int* init_loc,
                           double max_route_time, int32_t* out, int max_len) {
  (void)init_loc;
  if (n_nodes <= 1 || num_vehicles <= 0) return -1;
  Problem p{n_nodes, num_vehicles, max_route_time, time_matrix, penalties};
  std::vector<std::vector<int>> routes;
  construct_cheapest_arc_exact(p, routes);
  for (int v = 0; v < num_vehicles; ++v) {
    int len = std::min<int>(routes[v].size(), max_len - 1);
    for (int i = 0; i < len; ++i) out[v * max_len + i] = routes[v][i];
    out[v * max_len + len] = -1;
  }
  return 0;
}

}  // extern "C"
