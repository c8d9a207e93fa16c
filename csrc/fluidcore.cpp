// fluidcore — native C++ CPU reference engine.
//
// Reference counterpart: the reference's C++ host runtime and CPU solver path
// (SURVEY.md §2 "CPU reference path" / §3.4 updateCPU): same symmetric WCSPH
// physics as gpufluidsimulator_tpu/ops/naive.py, in double precision, with
// both an O(N^2) sweep and a uniform-grid cell-list sweep, multithreaded
// with std::thread.  Exposed via a C ABI for the ctypes wrapper
// (gpufluidsimulator_tpu/oracle/native.py); used as the fast correctness
// oracle at particle counts where the NumPy path is too slow.
//
// Build: make -C csrc     (produces libfluidcore.so)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

struct Params {
    int32_t dim;
    double h, rest_density, stiffness, viscosity, particle_mass, dt;
    double gravity[3];
    double bounds_min[3], bounds_max[3];
    double restitution;
    int32_t clamp_negative_pressure;
    int32_t tait;             // 0 = linear EOS, 1 = Tait
    double tait_gamma;
    // obstacles: n_obs rows of [kind(0=box,1=sphere), cx,cy,cz, p1,p2,p3]
    int32_t n_obs;
    const double* obs;
};

struct Coefs {
    double poly6, spiky_grad, visc_lap;
};

Coefs coefs(double h, int dim) {
    const double pi = 3.14159265358979323846;
    if (dim == 3)
        return {315.0 / (64.0 * pi * std::pow(h, 9)),
                -45.0 / (pi * std::pow(h, 6)),
                45.0 / (pi * std::pow(h, 6))};
    return {4.0 / (pi * std::pow(h, 8)),
            -30.0 / (pi * std::pow(h, 5)),
            40.0 / (pi * std::pow(h, 5))};
}

void parallel_for(int64_t n, const std::function<void(int64_t, int64_t)>& fn) {
    unsigned nt = std::max(1u, std::thread::hardware_concurrency());
    nt = std::min<unsigned>(nt, 64);
    if (n < 1024) { fn(0, n); return; }
    std::vector<std::thread> ts;
    int64_t chunk = (n + nt - 1) / nt;
    for (unsigned t = 0; t < nt; ++t) {
        int64_t lo = t * chunk, hi = std::min<int64_t>(n, lo + chunk);
        if (lo >= hi) break;
        ts.emplace_back(fn, lo, hi);
    }
    for (auto& t : ts) t.join();
}

double eos(double rho, const Params& p) {
    double pr;
    if (p.tait) {
        double b = p.stiffness * p.rest_density / p.tait_gamma;
        pr = b * (std::pow(rho / p.rest_density, p.tait_gamma) - 1.0);
    } else {
        pr = p.stiffness * (rho - p.rest_density);
    }
    if (p.clamp_negative_pressure && pr < 0.0) pr = 0.0;
    return pr;
}

// ---- neighbor iteration helpers -------------------------------------------

struct Grid {
    int nx, ny, nz, dim;
    double cell, ox, oy, oz;
    std::vector<int32_t> cell_start;   // CSR offsets per cell (size C+1)
    std::vector<int32_t> order;        // particle ids grouped by cell

    int cidx(const double* q) const {
        int cx = std::clamp((int)std::floor((q[0] - ox) / cell), 0, nx - 1);
        int cy = std::clamp((int)std::floor((q[1] - oy) / cell), 0, ny - 1);
        int cz = dim == 3
            ? std::clamp((int)std::floor((q[2] - oz) / cell), 0, nz - 1) : 0;
        return (cz * ny + cy) * nx + cx;
    }

    void build(const double* pos, int64_t n, const Params& p) {
        dim = p.dim;
        cell = p.h;
        ox = p.bounds_min[0]; oy = p.bounds_min[1];
        oz = dim == 3 ? p.bounds_min[2] : 0.0;
        nx = std::max(1, (int)std::ceil((p.bounds_max[0] - ox) / cell));
        ny = std::max(1, (int)std::ceil((p.bounds_max[1] - oy) / cell));
        nz = dim == 3
            ? std::max(1, (int)std::ceil((p.bounds_max[2] - oz) / cell)) : 1;
        int64_t c = (int64_t)nx * ny * nz;
        cell_start.assign(c + 1, 0);
        std::vector<int32_t> cid(n);
        for (int64_t i = 0; i < n; ++i) {
            cid[i] = cidx(pos + i * dim);
            cell_start[cid[i] + 1]++;
        }
        for (int64_t i = 0; i < c; ++i) cell_start[i + 1] += cell_start[i];
        order.resize(n);
        std::vector<int32_t> fill(cell_start.begin(), cell_start.end() - 1);
        for (int64_t i = 0; i < n; ++i) order[fill[cid[i]]++] = (int32_t)i;
    }

    template <class F>
    void neighbors(const double* q, F&& f) const {
        int cx = std::clamp((int)std::floor((q[0] - ox) / cell), 0, nx - 1);
        int cy = std::clamp((int)std::floor((q[1] - oy) / cell), 0, ny - 1);
        int cz = dim == 3
            ? std::clamp((int)std::floor((q[2] - oz) / cell), 0, nz - 1) : 0;
        for (int dz = (dim == 3 ? -1 : 0); dz <= (dim == 3 ? 1 : 0); ++dz)
            for (int dy = -1; dy <= 1; ++dy)
                for (int dx = -1; dx <= 1; ++dx) {
                    int X = cx + dx, Y = cy + dy, Z = cz + dz;
                    if (X < 0 || X >= nx || Y < 0 || Y >= ny ||
                        Z < 0 || Z >= nz) continue;
                    int64_t cc = ((int64_t)Z * ny + Y) * nx + X;
                    for (int32_t s = cell_start[cc];
                         s < cell_start[cc + 1]; ++s)
                        f(order[s]);
                }
    }
};

void density_pass(const double* pos, double* rho, double* pres, int64_t n,
                  const Params& p, const Grid* grid) {
    Coefs c = coefs(p.h, p.dim);
    double h2 = p.h * p.h;
    int dim = p.dim;
    parallel_for(n, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
            const double* xi = pos + i * dim;
            double acc = 0.0;
            auto contrib = [&](int64_t j) {
                const double* xj = pos + j * dim;
                double r2 = 0.0;
                for (int d = 0; d < dim; ++d) {
                    double dd = xi[d] - xj[d];
                    r2 += dd * dd;
                }
                if (r2 < h2) {
                    double t = h2 - r2;
                    acc += t * t * t;
                }
            };
            if (grid) grid->neighbors(xi, contrib);
            else for (int64_t j = 0; j < n; ++j) contrib(j);
            rho[i] = p.particle_mass * c.poly6 * acc;
            pres[i] = eos(rho[i], p);
        }
    });
}

void force_integrate_pass(double* pos, double* vel, const double* rho,
                          const double* pres, int64_t n, const Params& p,
                          const Grid* grid) {
    Coefs c = coefs(p.h, p.dim);
    double h2 = p.h * p.h;
    int dim = p.dim;
    std::vector<double> acc((size_t)n * dim);
    parallel_for(n, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
            const double* xi = pos + i * dim;
            const double* vi = vel + i * dim;
            double pi_r2 = pres[i] / (rho[i] * rho[i]);
            double a[3] = {0, 0, 0};
            auto contrib = [&](int64_t j) {
                if (j == (int64_t)i) return;
                const double* xj = pos + j * dim;
                double d[3], r2 = 0.0;
                for (int k = 0; k < dim; ++k) {
                    d[k] = xi[k] - xj[k];
                    r2 += d[k] * d[k];
                }
                if (r2 >= h2 || r2 <= 1e-16) return;
                double r = std::sqrt(r2);
                double hr = p.h - r;
                double g = c.spiky_grad * hr * hr;
                double coef_p = -p.particle_mass
                    * (pi_r2 + pres[j] / (rho[j] * rho[j])) * g / r;
                double lap = c.visc_lap * hr;
                double coef_v = p.viscosity * p.particle_mass * lap
                    / (rho[i] * rho[j]);
                const double* vj = vel + j * dim;
                for (int k = 0; k < dim; ++k)
                    a[k] += coef_p * d[k] + coef_v * (vj[k] - vi[k]);
            };
            if (grid) grid->neighbors(xi, contrib);
            else for (int64_t j = 0; j < n; ++j) contrib(j);
            for (int k = 0; k < dim; ++k)
                acc[i * dim + k] = a[k] + p.gravity[k];
        }
    });
    // symplectic Euler + walls + obstacles (matches ops/physics.py)
    parallel_for(n, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
            double* x = pos + i * dim;
            double* v = vel + i * dim;
            for (int k = 0; k < dim; ++k) {
                v[k] += acc[i * dim + k] * p.dt;
                x[k] += v[k] * p.dt;
                if (x[k] < p.bounds_min[k]) {
                    x[k] = p.bounds_min[k];
                    v[k] *= -p.restitution;
                } else if (x[k] > p.bounds_max[k]) {
                    x[k] = p.bounds_max[k];
                    v[k] *= -p.restitution;
                }
            }
            for (int o = 0; o < p.n_obs; ++o) {
                const double* ob = p.obs + o * 7;
                int kind = (int)ob[0];
                const double* ctr = ob + 1;
                double nvec[3] = {0, 0, 0};
                double sdf;
                if (kind == 1) {            // sphere
                    double rr = 0;
                    for (int k = 0; k < dim; ++k) {
                        nvec[k] = x[k] - ctr[k];
                        rr += nvec[k] * nvec[k];
                    }
                    rr = std::sqrt(rr + 1e-20);
                    sdf = rr - ob[4];
                    for (int k = 0; k < dim; ++k) nvec[k] /= rr;
                } else {                    // box
                    const double* half = ob + 4;
                    double q[3], qmax = -1e30;
                    int amax = 0;
                    double out2 = 0.0;
                    for (int k = 0; k < dim; ++k) {
                        q[k] = std::fabs(x[k] - ctr[k]) - half[k];
                        if (q[k] > qmax) { qmax = q[k]; amax = k; }
                        double oq = std::max(q[k], 0.0);
                        out2 += oq * oq;
                    }
                    if (qmax > 0.0) {
                        double so = std::sqrt(out2 + 1e-20);
                        sdf = so;
                        for (int k = 0; k < dim; ++k)
                            nvec[k] = std::max(q[k], 0.0)
                                * (x[k] >= ctr[k] ? 1.0 : -1.0) / so;
                    } else {
                        sdf = qmax;          // negative inside
                        nvec[amax] = x[amax] >= ctr[amax] ? 1.0 : -1.0;
                    }
                }
                if (sdf < 0.0) {
                    for (int k = 0; k < dim; ++k) x[k] -= sdf * nvec[k];
                    double vn = 0;
                    for (int k = 0; k < dim; ++k) vn += v[k] * nvec[k];
                    if (vn < 0.0) {
                        double dv = (1.0 + p.restitution) * vn;
                        for (int k = 0; k < dim; ++k) v[k] -= dv * nvec[k];
                    }
                }
            }
        }
    });
}

void step(double* pos, double* vel, double* rho, double* pres, int64_t n,
          const Params& p, bool use_grid) {
    Grid grid;
    Grid* gp = nullptr;
    if (use_grid) {
        grid.build(pos, n, p);
        gp = &grid;
    }
    density_pass(pos, rho, pres, n, p, gp);
    force_integrate_pass(pos, vel, rho, pres, n, p, gp);
}

}  // namespace

extern "C" {

// pos/vel: (n, dim) row-major double, updated in place.
// rho/pres: (n,) outputs.  scalars: see Params.  Returns 0 on success.
int fluid_steps(double* pos, double* vel, double* rho, double* pres,
                int64_t n, int32_t n_steps, int32_t use_grid,
                int32_t dim, double h, double rest_density, double stiffness,
                double viscosity, double particle_mass, double dt,
                const double* gravity, const double* bounds_min,
                const double* bounds_max, double restitution,
                int32_t clamp_negative_pressure, int32_t tait,
                double tait_gamma, int32_t n_obs, const double* obs) {
    if (dim != 2 && dim != 3) return 1;
    Params p;
    p.dim = dim; p.h = h; p.rest_density = rest_density;
    p.stiffness = stiffness; p.viscosity = viscosity;
    p.particle_mass = particle_mass; p.dt = dt;
    std::memcpy(p.gravity, gravity, sizeof(double) * dim);
    std::memcpy(p.bounds_min, bounds_min, sizeof(double) * dim);
    std::memcpy(p.bounds_max, bounds_max, sizeof(double) * dim);
    p.restitution = restitution;
    p.clamp_negative_pressure = clamp_negative_pressure;
    p.tait = tait; p.tait_gamma = tait_gamma;
    p.n_obs = n_obs; p.obs = obs;
    for (int32_t s = 0; s < n_steps; ++s)
        step(pos, vel, rho, pres, n, p, use_grid != 0);
    return 0;
}

}  // extern "C"
