// Native geometry-generator CLI -- the C++ counterpart of the reference's
// standalone tools (screw_dislocation_bcc_fe.cpp, stgb.cpp), with the
// hard-coded source constants (screw_…cpp:28,31; stgb.cpp:21-23) exposed as
// flags. Equivalent Python: `python -m meng_zhang_tpu.tools`.
//
//   mzt_tools screw --nx 22 --ny 38 --nz 0.5 [--dislocation] -o fe_screw.dat
//   mzt_tools stgb  [--lx 34.97 --ly 49.455 --lz 32.304] -o fe.dat

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
long mzt_oriented_crystal(const double*, const double*, double, const double*,
                          int, int, double, double, double**);
void mzt_screw_uz(const double*, long, double, double, double, double*);
int mzt_write_data(const char*, long, const double*, const int*,
                   const double*, int, const double*, const double*, int,
                   const char*);
void mzt_free(void*);
}

static const double BCC[6] = {0, 0, 0, 0.5, 0.5, 0.5};
static const double A_FE = 2.8553;

static double argf(int argc, char** argv, const char* name, double dflt) {
    for (int i = 1; i < argc - 1; i++)
        if (!strcmp(argv[i], name)) return atof(argv[i + 1]);
    return dflt;
}
static const char* args(int argc, char** argv, const char* name,
                        const char* dflt) {
    for (int i = 1; i < argc - 1; i++)
        if (!strcmp(argv[i], name)) return argv[i + 1];
    return dflt;
}
static bool flag(int argc, char** argv, const char* name) {
    for (int i = 1; i < argc; i++)
        if (!strcmp(argv[i], name)) return true;
    return false;
}

int main(int argc, char** argv) {
    if (argc < 2) {
        fprintf(stderr, "usage: mzt_tools screw|stgb [options] -o out.dat\n");
        return 2;
    }
    const char* out = args(argc, argv, "-o", nullptr);
    if (!out) { fprintf(stderr, "error: -o required\n"); return 2; }
    double a = argf(argc, argv, "--lattice-a", A_FE);
    double lo[3] = {0, 0, 0};

    if (!strcmp(argv[1], "screw")) {
        double orient[9] = {1, 1, -2, 1, -1, 0, -1, -1, -1};
        double nl[3] = {argf(argc, argv, "--nx", 22),
                        argf(argc, argv, "--ny", 38),
                        argf(argc, argv, "--nz", 0.5)};
        double lb[3];
        for (int d = 0; d < 3; d++) {
            double dim = sqrt(orient[3 * d] * orient[3 * d] +
                              orient[3 * d + 1] * orient[3 * d + 1] +
                              orient[3 * d + 2] * orient[3 * d + 2]);
            lb[d] = nl[d] * dim * a;
        }
        double* x = nullptr;
        long n = mzt_oriented_crystal(orient, lb, a, BCC, 2, 1, 0, 0, &x);
        if (flag(argc, argv, "--dislocation")) {
            double b = sqrt(3.0) * a / 2.0;
            std::vector<double> uz(n);
            mzt_screw_uz(x, n, lb[0] / 2, lb[1] / 2, b, uz.data());
            for (long i = 0; i < n; i++) x[3 * i + 2] += uz[i];
        }
        double rb = argf(argc, argv, "--boundary-radius", 60.0);
        std::vector<int> types(n, 1);
        for (long i = 0; i < n; i++) {
            double dx = x[3 * i] - lb[0] / 2, dy = x[3 * i + 1] - lb[1] / 2,
                   dz = x[3 * i + 2] - lb[2] / 2;
            if (sqrt(dx * dx + dy * dy + dz * dz) >= rb) types[i] = 2;
        }
        mzt_write_data(out, n, x, types.data(), nullptr, 0, lo, lb, 2,
                       "bcc-Fe screw-dislocation scene (mzt_tools)");
        fprintf(stderr, "%ld atoms -> %s\n", n, out);
        mzt_free(x);
        return 0;
    }

    if (!strcmp(argv[1], "stgb")) {
        double orient[9] = {-1, 1, -2, 1, -1, -1, 1, 1, 0};
        double lb[3] = {argf(argc, argv, "--lx", 34.97014031),
                        argf(argc, argv, "--ly", 49.45524671),
                        argf(argc, argv, "--lz", 32.30403188)};
        double* x1 = nullptr;
        long n1 = mzt_oriented_crystal(orient, lb, a, BCC, 2, 0, 1.0, 1.0, &x1);
        double prune = argf(argc, argv, "--delete-overlap", 0.0);
        std::vector<double> x;
        std::vector<int> types;
        x.reserve(6 * n1);
        for (long i = 0; i < n1; i++) {
            x.push_back(x1[3 * i]); x.push_back(x1[3 * i + 1]);
            x.push_back(x1[3 * i + 2]);
            types.push_back(1);
        }
        double big[3] = {2 * lb[0], lb[1], lb[2]};
        for (long i = 0; i < n1; i++) {
            double m[3] = {2 * lb[0] - x1[3 * i], x1[3 * i + 1], x1[3 * i + 2]};
            bool keep = true;
            if (prune > 0) {
                for (long j = 0; j < n1 && keep; j++) {
                    double d2 = 0;
                    for (int d = 0; d < 3; d++) {
                        double dd = m[d] - x1[3 * j + d];
                        dd -= big[d] * round(dd / big[d]);
                        d2 += dd * dd;
                    }
                    if (d2 < prune * prune) keep = false;
                }
            }
            if (keep) {
                x.push_back(m[0]); x.push_back(m[1]); x.push_back(m[2]);
                types.push_back(2);
            }
        }
        long n = (long)types.size();
        mzt_write_data(out, n, x.data(), types.data(), nullptr, 0, lo, big, 2,
                       "bcc-Fe STGB bicrystal (mzt_tools)");
        fprintf(stderr, "%ld atoms -> %s\n", n, out);
        mzt_free(x1);
        return 0;
    }
    fprintf(stderr, "unknown command %s\n", argv[1]);
    return 2;
}
