// Native host runtime for allocnet_tpu: grid-collision RRT front-end.
//
// The reference's front-end is native C++ (OMPL InformedRRT*, sfc_gen.hpp:
// 45-114, plus voxel_map.hpp collision queries); this is its equivalent for
// the TPU framework: the host-side path search that feeds scenario batches
// to the TPU corridor/QP pipeline.  Collision checks use a dilated dense
// occupancy grid (O(1) per query) built once per map — the Python fallback
// (allocnet_tpu/planner/rrt.py) uses a KD-tree and is ~20x slower per plan.
//
// C ABI (ctypes):
//   void* grid_create(const double* pts, int n, const double* lo,
//                     const double* hi, double scale, double safe_dis);
//   void  grid_destroy(void* grid);
//   int   grid_query(void* grid, const double* p);        // 1 = blocked
//   int   rrt_plan(void* grid, const double* start, const double* goal,
//                  double step, int max_iter, double goal_bias,
//                  unsigned long long seed,
//                  double* out_path, int max_pts);   // returns #waypoints
//   int   simplify_path(void* grid, const double* path, int n,
//                       double* out, int max_pts);
//   int   cloud_crop_windows(const double* pts, int n, const double* lo_bs,
//                            const double* hi_bs, int n_windows, double cell,
//                            double* out_pts, double* out_mask, int n_max);
//
// Build: make -C runtime   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <chrono>
#include <random>
#include <vector>

namespace {

struct Grid {
    int nx, ny, nz;
    double lo[3];
    double hi[3];
    double scale;
    std::vector<uint8_t> occ;

    inline bool blocked(const double* p) const {
        for (int j = 0; j < 3; ++j)
            if (p[j] < lo[j] || p[j] > hi[j]) return true;
        int ix = (int)((p[0] - lo[0]) / scale);
        int iy = (int)((p[1] - lo[1]) / scale);
        int iz = (int)((p[2] - lo[2]) / scale);
        if (ix < 0 || iy < 0 || iz < 0 || ix >= nx || iy >= ny || iz >= nz)
            return true;
        return occ[(size_t)(ix * ny + iy) * nz + iz] != 0;
    }

    inline bool edge_blocked(const double* a, const double* b) const {
        double d[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
        double len = std::sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2]);
        int n = (int)(len / (0.5 * scale)) + 2;
        double p[3];
        for (int k = 0; k <= n; ++k) {
            double t = (double)k / n;
            p[0] = a[0] + t * d[0];
            p[1] = a[1] + t * d[1];
            p[2] = a[2] + t * d[2];
            if (blocked(p)) return true;
        }
        return false;
    }
};

// Uniform bucket index over tree nodes: O(1) amortized nearest-node and
// radius queries, replacing the O(N)-per-iteration linear scans that made
// RRT* quadratic in iteration count (an OMPL NearestNeighborsGNAT
// equivalent, shaped for the bounded workspace: cell ~= step so a cell
// holds O(1) nodes).
struct NodeIndex {
    double lo[3];
    double cell;
    int nx, ny, nz;
    std::vector<std::vector<int>> cells;
    const std::vector<double>* nodes;  // flat xyz triples

    void init(const double* lo_, const double* hi_, double cell_,
              const std::vector<double>* nodes_) {
        std::memcpy(lo, lo_, sizeof(lo));
        cell = cell_;
        nx = std::max(1, (int)std::ceil((hi_[0] - lo_[0]) / cell));
        ny = std::max(1, (int)std::ceil((hi_[1] - lo_[1]) / cell));
        nz = std::max(1, (int)std::ceil((hi_[2] - lo_[2]) / cell));
        cells.assign((size_t)nx * ny * nz, {});
        nodes = nodes_;
    }

    inline void coords(const double* p, int* c) const {
        c[0] = std::clamp((int)((p[0] - lo[0]) / cell), 0, nx - 1);
        c[1] = std::clamp((int)((p[1] - lo[1]) / cell), 0, ny - 1);
        c[2] = std::clamp((int)((p[2] - lo[2]) / cell), 0, nz - 1);
    }

    void insert(int i, const double* p) {
        int c[3];
        coords(p, c);
        cells[(size_t)(c[0] * ny + c[1]) * nz + c[2]].push_back(i);
    }

    // index of the nearest node; best_d2 <- squared distance.  Expanding
    // shell search: a node in shell s is at least (s-1)*cell away, so once
    // sqrt(best_d2) < (s-1)*cell no farther shell can win.
    int nearest(const double* p, double* best_d2) const {
        int c[3];
        coords(p, c);
        int best = -1;
        double bd2 = 1e300;
        int smax = std::max({nx, ny, nz});
        for (int s = 0; s <= smax; ++s) {
            if (best >= 0) {
                double lb = (double)(s - 1) * cell;
                if (lb > 0 && lb * lb > bd2) break;
            }
            int x0 = std::max(c[0] - s, 0), x1 = std::min(c[0] + s, nx - 1);
            int y0 = std::max(c[1] - s, 0), y1 = std::min(c[1] + s, ny - 1);
            int z0 = std::max(c[2] - s, 0), z1 = std::min(c[2] + s, nz - 1);
            for (int x = x0; x <= x1; ++x)
                for (int y = y0; y <= y1; ++y)
                    for (int z = z0; z <= z1; ++z) {
                        // shell only: skip the interior already scanned
                        if (s > 0 && x != x0 && x != x1 && y != y0 &&
                            y != y1 && z != z0 && z != z1)
                            continue;
                        for (int k : cells[(size_t)(x * ny + y) * nz + z]) {
                            const double* q = nodes->data() + 3 * k;
                            double dx = q[0] - p[0], dy = q[1] - p[1],
                                   dz = q[2] - p[2];
                            double d2 = dx * dx + dy * dy + dz * dz;
                            if (d2 < bd2) { bd2 = d2; best = k; }
                        }
                    }
        }
        *best_d2 = bd2;
        return best;
    }

    // all node indices within radius r of p (appended to out)
    void radius(const double* p, double r, std::vector<int>* out) const {
        out->clear();
        int c0[3], c1[3];
        double pl[3] = {p[0] - r, p[1] - r, p[2] - r};
        double ph[3] = {p[0] + r, p[1] + r, p[2] + r};
        coords(pl, c0);
        coords(ph, c1);
        double r2 = r * r;
        for (int x = c0[0]; x <= c1[0]; ++x)
            for (int y = c0[1]; y <= c1[1]; ++y)
                for (int z = c0[2]; z <= c1[2]; ++z)
                    for (int k : cells[(size_t)(x * ny + y) * nz + z]) {
                        const double* q = nodes->data() + 3 * k;
                        double dx = q[0] - p[0], dy = q[1] - p[1],
                               dz = q[2] - p[2];
                        if (dx * dx + dy * dy + dz * dz <= r2)
                            out->push_back(k);
                    }
    }
};

}  // namespace

extern "C" {

void* grid_create(const double* pts, int n, const double* lo,
                  const double* hi, double scale, double safe_dis) {
    Grid* g = new Grid();
    std::memcpy(g->lo, lo, sizeof(g->lo));
    std::memcpy(g->hi, hi, sizeof(g->hi));
    g->scale = scale;
    g->nx = (int)std::ceil((hi[0] - lo[0]) / scale);
    g->ny = (int)std::ceil((hi[1] - lo[1]) / scale);
    g->nz = (int)std::ceil((hi[2] - lo[2]) / scale);
    if (g->nx < 1) g->nx = 1;
    if (g->ny < 1) g->ny = 1;
    if (g->nz < 1) g->nz = 1;
    g->occ.assign((size_t)g->nx * g->ny * g->nz, 0);

    // mark obstacle voxels
    for (int i = 0; i < n; ++i) {
        const double* p = pts + 3 * i;
        int ix = (int)((p[0] - lo[0]) / scale);
        int iy = (int)((p[1] - lo[1]) / scale);
        int iz = (int)((p[2] - lo[2]) / scale);
        if (ix < 0 || iy < 0 || iz < 0 || ix >= g->nx || iy >= g->ny ||
            iz >= g->nz)
            continue;
        g->occ[(size_t)(ix * g->ny + iy) * g->nz + iz] = 1;
    }

    // dilate by ceil(safe_dis / scale) rounds of 26-neighbor dilation
    // (voxel_dilater.hpp:26-53 equivalent)
    int rounds = (int)std::ceil(safe_dis / scale);
    std::vector<uint8_t> next(g->occ.size());
    for (int r = 0; r < rounds; ++r) {
        next = g->occ;
        for (int x = 0; x < g->nx; ++x)
            for (int y = 0; y < g->ny; ++y)
                for (int z = 0; z < g->nz; ++z) {
                    if (!g->occ[(size_t)(x * g->ny + y) * g->nz + z]) continue;
                    for (int dx = -1; dx <= 1; ++dx)
                        for (int dy = -1; dy <= 1; ++dy)
                            for (int dz = -1; dz <= 1; ++dz) {
                                int xx = x + dx, yy = y + dy, zz = z + dz;
                                if (xx < 0 || yy < 0 || zz < 0 ||
                                    xx >= g->nx || yy >= g->ny || zz >= g->nz)
                                    continue;
                                next[(size_t)(xx * g->ny + yy) * g->nz + zz] = 1;
                            }
                }
        g->occ.swap(next);
    }
    return g;
}

void grid_destroy(void* grid) { delete (Grid*)grid; }

int grid_query(void* grid, const double* p) {
    return ((Grid*)grid)->blocked(p) ? 1 : 0;
}

int rrt_plan(void* grid, const double* start, const double* goal, double step,
             int max_iter, double goal_bias, unsigned long long seed,
             double* out_path, int max_pts) {
    Grid* g = (Grid*)grid;
    if (g->blocked(start) || g->blocked(goal)) return 0;

    std::mt19937_64 rng(seed);
    std::uniform_real_distribution<double> uni(0.0, 1.0);

    std::vector<double> nodes;  // 3 * count
    std::vector<int> parents;
    nodes.reserve(3 * (max_iter + 2));
    nodes.insert(nodes.end(), start, start + 3);
    parents.push_back(-1);

    double sample[3], nw[3];
    for (int it = 0; it < max_iter; ++it) {
        if (uni(rng) < goal_bias) {
            std::memcpy(sample, goal, sizeof(sample));
        } else {
            for (int j = 0; j < 3; ++j)
                sample[j] = g->lo[j] + uni(rng) * (g->hi[j] - g->lo[j]);
            if (g->blocked(sample)) continue;
        }
        // nearest node
        int count = (int)parents.size();
        int best = 0;
        double bestd = 1e300;
        for (int k = 0; k < count; ++k) {
            double dx = nodes[3 * k] - sample[0];
            double dy = nodes[3 * k + 1] - sample[1];
            double dz = nodes[3 * k + 2] - sample[2];
            double d = dx * dx + dy * dy + dz * dz;
            if (d < bestd) { bestd = d; best = k; }
        }
        double dist = std::sqrt(bestd);
        if (dist < 1e-9) continue;
        double t = step < dist ? step / dist : 1.0;
        for (int j = 0; j < 3; ++j)
            nw[j] = nodes[3 * best + j] +
                    t * (sample[j] - nodes[3 * best + j]);
        if (g->edge_blocked(&nodes[3 * best], nw)) continue;
        nodes.insert(nodes.end(), nw, nw + 3);
        parents.push_back(best);

        double dgx = nw[0] - goal[0], dgy = nw[1] - goal[1],
               dgz = nw[2] - goal[2];
        if (std::sqrt(dgx * dgx + dgy * dgy + dgz * dgz) <= step &&
            !g->edge_blocked(nw, goal)) {
            // backtrack
            std::vector<int> chain;
            int i = (int)parents.size() - 1;
            while (i >= 0) { chain.push_back(i); i = parents[i]; }
            int total = (int)chain.size() + 1;
            if (total > max_pts) return -total;  // caller buffer too small
            int w = 0;
            for (int k = (int)chain.size() - 1; k >= 0; --k, ++w)
                std::memcpy(out_path + 3 * w, &nodes[3 * chain[k]],
                            3 * sizeof(double));
            std::memcpy(out_path + 3 * w, goal, 3 * sizeof(double));
            return total;
        }
    }
    return 0;
}

// Informed RRT* (the reference front-end: OMPL InformedRRTstar with a
// 10 ms budget, sfc_gen.hpp:45-114 / learning_planner.hpp:257).  Plain RRT
// returns the FIRST path found; RRT* keeps optimizing: new nodes choose the
// cheapest parent in a shrinking neighborhood, neighbors are rewired
// through cheaper new nodes (costs propagated to descendants), and once a
// solution exists sampling is restricted to the prolate spheroid with foci
// start/goal and transverse diameter = best cost (Gammell et al. 2014) —
// states outside it provably cannot improve the path.
//
//   int rrt_star_plan(void* grid, const double* start, const double* goal,
//                     double step, int max_iter, double goal_bias,
//                     unsigned long long seed, double time_budget_s,
//                     double* out_path, int max_pts);  // #waypoints or 0
int rrt_star_plan(void* grid, const double* start, const double* goal,
                  double step, int max_iter, double goal_bias,
                  unsigned long long seed, double time_budget_s,
                  double* out_path, int max_pts) {
    Grid* g = (Grid*)grid;
    if (g->blocked(start) || g->blocked(goal)) return 0;

    std::mt19937_64 rng(seed);
    std::uniform_real_distribution<double> uni(0.0, 1.0);
    std::normal_distribution<double> gauss(0.0, 1.0);

    std::vector<double> nodes;                  // 3 * count
    std::vector<int> parents;
    std::vector<double> costs;
    std::vector<std::vector<int>> children;
    nodes.insert(nodes.end(), start, start + 3);
    parents.push_back(-1);
    costs.push_back(0.0);
    children.emplace_back();

    NodeIndex index;
    index.init(g->lo, g->hi, std::max(step, g->scale), &nodes);
    index.insert(0, start);
    std::vector<int> nbrs;

    auto dist3 = [](const double* a, const double* b) {
        double dx = a[0] - b[0], dy = a[1] - b[1], dz = a[2] - b[2];
        return std::sqrt(dx * dx + dy * dy + dz * dz);
    };

    // informed-sampling frame: rotation taking e1 -> (goal-start)/c_min
    const double c_min = dist3(start, goal);
    double centre[3] = {(start[0] + goal[0]) / 2, (start[1] + goal[1]) / 2,
                        (start[2] + goal[2]) / 2};
    double a1[3] = {(goal[0] - start[0]) / c_min, (goal[1] - start[1]) / c_min,
                    (goal[2] - start[2]) / c_min};
    // complete an orthonormal basis {a1, a2, a3}
    double ref[3] = {1.0, 0.0, 0.0};
    if (std::fabs(a1[0]) > 0.9) { ref[0] = 0.0; ref[1] = 1.0; }
    double a2[3] = {a1[1] * ref[2] - a1[2] * ref[1],
                    a1[2] * ref[0] - a1[0] * ref[2],
                    a1[0] * ref[1] - a1[1] * ref[0]};
    double n2 = std::sqrt(a2[0] * a2[0] + a2[1] * a2[1] + a2[2] * a2[2]);
    for (int j = 0; j < 3; ++j) a2[j] /= n2;
    double a3[3] = {a1[1] * a2[2] - a1[2] * a2[1],
                    a1[2] * a2[0] - a1[0] * a2[2],
                    a1[0] * a2[1] - a1[1] * a2[0]};

    // RRT* neighbourhood constant (free-space measure over-approximated by
    // the map box; d = 3)
    double vol = (g->hi[0] - g->lo[0]) * (g->hi[1] - g->lo[1]) *
                 (g->hi[2] - g->lo[2]);
    const double gamma =
        2.0 * std::cbrt((1.0 + 1.0 / 3.0) * vol / (4.0 / 3.0 * M_PI));

    double best_cost = 1e300;
    int best_goal_parent = -1;

    const auto t_start = std::chrono::steady_clock::now();
    auto elapsed_s = [&]() {
        return std::chrono::duration<double>(
                   std::chrono::steady_clock::now() - t_start)
            .count();
    };

    std::vector<int> stack;
    double sample[3], nw[3], ball[3];
    for (int it = 0; it < max_iter; ++it) {
        if (time_budget_s > 0 && (it & 63) == 0 && elapsed_s() > time_budget_s)
            break;

        // ---- sample ----
        if (best_cost < 1e299) {
            // informed: uniform in the prolate spheroid (reject to free)
            double r1 = best_cost / 2.0;
            double r23 = std::sqrt(std::max(best_cost * best_cost -
                                            c_min * c_min, 0.0)) / 2.0;
            bool ok = false;
            for (int tries = 0; tries < 16 && !ok; ++tries) {
                // uniform in the unit ball
                double nrm2;
                do {
                    for (int j = 0; j < 3; ++j) ball[j] = 2 * uni(rng) - 1;
                    nrm2 = ball[0] * ball[0] + ball[1] * ball[1] +
                           ball[2] * ball[2];
                } while (nrm2 > 1.0);
                double e1 = r1 * ball[0], e2 = r23 * ball[1],
                       e3 = r23 * ball[2];
                for (int j = 0; j < 3; ++j)
                    sample[j] = centre[j] + a1[j] * e1 + a2[j] * e2 +
                                a3[j] * e3;
                ok = !g->blocked(sample);
            }
            if (!ok) continue;
        } else if (uni(rng) < goal_bias) {
            std::memcpy(sample, goal, sizeof(sample));
        } else {
            for (int j = 0; j < 3; ++j)
                sample[j] = g->lo[j] + uni(rng) * (g->hi[j] - g->lo[j]);
            if (g->blocked(sample)) continue;
        }

        // ---- steer from nearest (bucket index; was an O(N) scan) ----
        int count = (int)parents.size();
        double bestd;
        int nearest = index.nearest(sample, &bestd);
        double dn = std::sqrt(bestd);
        if (dn < 1e-9) continue;
        double t = step < dn ? step / dn : 1.0;
        for (int j = 0; j < 3; ++j)
            nw[j] = nodes[3 * nearest + j] +
                    t * (sample[j] - nodes[3 * nearest + j]);
        if (g->blocked(nw)) continue;

        // ---- choose parent in the shrinking neighbourhood ----
        double r = std::min(gamma * std::cbrt(std::log((double)count + 1.0) /
                                              (count + 1.0)),
                            4.0 * step);
        int par = nearest;
        double par_cost = costs[nearest] + dist3(&nodes[3 * nearest], nw);
        index.radius(nw, r, &nbrs);
        for (int k : nbrs) {
            double c = costs[k] + dist3(&nodes[3 * k], nw);
            if (c < par_cost && !g->edge_blocked(&nodes[3 * k], nw)) {
                par = k;
                par_cost = c;
            }
        }
        if (par == nearest && g->edge_blocked(&nodes[3 * nearest], nw))
            continue;

        int ni = count;
        nodes.insert(nodes.end(), nw, nw + 3);
        parents.push_back(par);
        costs.push_back(par_cost);
        children.emplace_back();
        children[par].push_back(ni);
        index.insert(ni, nw);

        // ---- rewire neighbours through the new node ----
        for (int k : nbrs) {
            double d = dist3(&nodes[3 * k], nw);
            double c_through = par_cost + d;
            if (c_through + 1e-12 < costs[k] &&
                !g->edge_blocked(nw, &nodes[3 * k])) {
                auto& sib = children[parents[k]];
                sib.erase(std::find(sib.begin(), sib.end(), k));
                parents[k] = ni;
                children[ni].push_back(k);
                double dc = c_through - costs[k];
                // propagate the cost improvement to all descendants
                stack.assign(1, k);
                while (!stack.empty()) {
                    int v = stack.back();
                    stack.pop_back();
                    costs[v] += dc;
                    for (int c2 : children[v]) stack.push_back(c2);
                }
            }
        }

        // ---- try the goal connection ----
        double dg = dist3(nw, goal);
        if (dg <= std::max(step, r) && par_cost + dg < best_cost &&
            !g->edge_blocked(nw, goal)) {
            best_cost = par_cost + dg;
            best_goal_parent = ni;
        }
    }

    // final sweep: rewiring can have made OTHER nodes cheaper routes to the
    // goal than the one that held best_cost when it was connected — scan
    // every node in goal range once (new nodes only try the connection at
    // insertion time)
    {
        int count = (int)parents.size();
        double r = std::min(gamma * std::cbrt(std::log((double)count + 1.0) /
                                              (count + 1.0)),
                            4.0 * step);
        double rng_goal = std::max(step, r);
        for (int k = 0; k < count; ++k) {
            double dg = dist3(&nodes[3 * k], goal);
            if (dg <= rng_goal && costs[k] + dg < best_cost &&
                !g->edge_blocked(&nodes[3 * k], goal)) {
                best_cost = costs[k] + dg;
                best_goal_parent = k;
            }
        }
    }

    if (best_goal_parent < 0) return 0;
    // best_goal_parent's cost may have improved via rewiring; the chain is
    // whatever the tree says now
    std::vector<int> chain;
    int i = best_goal_parent;
    while (i >= 0) { chain.push_back(i); i = parents[i]; }
    int total = (int)chain.size() + 1;
    if (total > max_pts) return -total;
    int w = 0;
    for (int k = (int)chain.size() - 1; k >= 0; --k, ++w)
        std::memcpy(out_path + 3 * w, &nodes[3 * chain[k]],
                    3 * sizeof(double));
    std::memcpy(out_path + 3 * w, goal, 3 * sizeof(double));
    return total;
}

// Batched corridor-window crop (the convexCover inner crop,
// sfc_gen.hpp:161-168).  The Python pipeline crops the map's surface cloud
// against every window's axis-aligned box before FIRI; done in NumPy that is
// O(n_windows * n) full-cloud scans and dominates datagen host time.  Here:
// one CSR uniform-grid index over the cloud (O(n)), then each window only
// scans the cells its box covers.  Output matches the NumPy semantics
// exactly: points STRICTLY inside (lo, hi), first n_max in original cloud
// order, padded with 1e9, mask 1.0 on valid rows.
int cloud_crop_windows(const double* pts, int n, const double* lo_bs,
                       const double* hi_bs, int n_windows, double cell,
                       double* out_pts, double* out_mask, int n_max) {
    if (n_windows <= 0 || n_max <= 0) return 0;
    for (long long k = 0; k < (long long)n_windows * n_max; ++k) {
        out_pts[3 * k] = 1e9;
        out_pts[3 * k + 1] = 1e9;
        out_pts[3 * k + 2] = 1e9;
        out_mask[k] = 0.0;
    }
    if (n <= 0) return 0;
    if (cell <= 0.0) cell = 1.0;

    double mn[3] = {pts[0], pts[1], pts[2]};
    double mx[3] = {pts[0], pts[1], pts[2]};
    for (int i = 1; i < n; ++i)
        for (int j = 0; j < 3; ++j) {
            double v = pts[3 * i + j];
            if (v < mn[j]) mn[j] = v;
            if (v > mx[j]) mx[j] = v;
        }
    int dim[3];
    for (int j = 0; j < 3; ++j) {
        dim[j] = (int)((mx[j] - mn[j]) / cell) + 1;
        if (dim[j] < 1) dim[j] = 1;
        if (dim[j] > 1024) dim[j] = 1024;  // cap memory; cells just get fatter
    }
    const double inv_cell[3] = {dim[0] / (mx[0] - mn[0] + 1e-12),
                                dim[1] / (mx[1] - mn[1] + 1e-12),
                                dim[2] / (mx[2] - mn[2] + 1e-12)};
    auto cell_of = [&](double v, int j) {
        int c = (int)((v - mn[j]) * inv_cell[j]);
        if (c < 0) c = 0;
        if (c >= dim[j]) c = dim[j] - 1;
        return c;
    };

    const size_t ncell = (size_t)dim[0] * dim[1] * dim[2];
    std::vector<int> start(ncell + 1, 0);
    std::vector<int> idx(n);
    for (int i = 0; i < n; ++i) {
        size_t c = ((size_t)cell_of(pts[3 * i], 0) * dim[1] +
                    cell_of(pts[3 * i + 1], 1)) * dim[2] +
                   cell_of(pts[3 * i + 2], 2);
        ++start[c + 1];
    }
    for (size_t c = 0; c < ncell; ++c) start[c + 1] += start[c];
    {
        std::vector<int> cursor(start.begin(), start.end() - 1);
        for (int i = 0; i < n; ++i) {
            size_t c = ((size_t)cell_of(pts[3 * i], 0) * dim[1] +
                        cell_of(pts[3 * i + 1], 1)) * dim[2] +
                       cell_of(pts[3 * i + 2], 2);
            idx[cursor[c]++] = i;  // stable: within a cell, original order
        }
    }

    std::vector<int> sel;
    for (int w = 0; w < n_windows; ++w) {
        const double* lo = lo_bs + 3 * w;
        const double* hi = hi_bs + 3 * w;
        if (lo[0] >= hi[0] || lo[1] >= hi[1] || lo[2] >= hi[2]) continue;
        int c0[3], c1[3];
        for (int j = 0; j < 3; ++j) {
            c0[j] = cell_of(lo[j], j);
            c1[j] = cell_of(hi[j], j);
        }
        sel.clear();
        for (int x = c0[0]; x <= c1[0]; ++x)
            for (int y = c0[1]; y <= c1[1]; ++y) {
                size_t base = ((size_t)x * dim[1] + y) * dim[2];
                int a = start[base + c0[2]];
                int b = start[base + c1[2] + 1];  // z-cells are contiguous
                for (int k = a; k < b; ++k) {
                    const double* p = pts + 3 * idx[k];
                    if (p[0] > lo[0] && p[0] < hi[0] && p[1] > lo[1] &&
                        p[1] < hi[1] && p[2] > lo[2] && p[2] < hi[2])
                        sel.push_back(idx[k]);
                }
            }
        std::sort(sel.begin(), sel.end());  // original cloud order
        int m = (int)sel.size() < n_max ? (int)sel.size() : n_max;
        double* op = out_pts + (long long)3 * w * n_max;
        double* om = out_mask + (long long)w * n_max;
        for (int k = 0; k < m; ++k) {
            std::memcpy(op + 3 * k, pts + 3 * sel[k], 3 * sizeof(double));
            om[k] = 1.0;
        }
    }
    return 0;
}

int simplify_path(void* grid, const double* path, int n, double* out,
                  int max_pts) {
    Grid* g = (Grid*)grid;
    if (n <= 2) {
        if (n > max_pts) return -n;
        std::memcpy(out, path, (size_t)3 * n * sizeof(double));
        return n;
    }
    std::vector<int> keep;
    keep.push_back(0);
    int i = 0;
    while (i < n - 1) {
        int j = n - 1;
        while (j > i + 1 && g->edge_blocked(path + 3 * i, path + 3 * j)) --j;
        keep.push_back(j);
        i = j;
    }
    if ((int)keep.size() > max_pts) return -(int)keep.size();
    for (size_t k = 0; k < keep.size(); ++k)
        std::memcpy(out + 3 * k, path + 3 * keep[k], 3 * sizeof(double));
    return (int)keep.size();
}

}  // extern "C"
