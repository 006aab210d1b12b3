// Native runtime components for meng_zhang_tpu.
//
// The reference framework's host runtime is C++ (LAMMPS drivers, Geryon
// marshalling, standalone geometry tools). The TPU compute path here is
// JAX/Pallas, but the IO-bound host pieces keep a native implementation:
//
//   * mzt_read_data / mzt_write_data -- LAMMPS data files (atomic style).
//     A 2M-atom file is ~65 MB of text; this parser runs ~3x faster than
//     the pure-Python reader (which remains as fallback).
//   * mzt_oriented_crystal -- replicate/rotate/clip lattice builder, the
//     core of both reference generators (building_matrix,
//     screw_dislocation_bcc_fe.cpp:101-169; build_crystal, stgb_b.cpp:91-165)
//   * mzt_screw_uz -- elastic screw-dislocation displacement field
//     (screw_dislocation, screw_…cpp:214-243)
//
// C ABI for ctypes; buffers are malloc'd here and released by mzt_free.
// Build: make -C native      ->  native/libmzt.so

#include <cctype>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

void mzt_free(void* p) { free(p); }

// ---------------------------------------------------------------- data read
// Returns n_atoms (>=0) or -1 on error. Allocates *x (3N doubles, id order),
// *types (N ints), and *v (3N doubles, zero-filled if no Velocities section;
// *has_v reports which).
long mzt_read_data(const char* path, double** x, int** types, double** v,
                   int* has_v, double** masses, int* has_masses,
                   double* box_lo, double* box_hi, int* n_types_out) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;

    char line[1024];
    long n = 0;
    int n_types = 0;
    double lo[3] = {0, 0, 0}, hi[3] = {0, 0, 0};

    if (!fgets(line, sizeof line, f)) { fclose(f); return -1; }  // comment

    // ---- header ----
    long section_pos = -1;
    while (fgets(line, sizeof line, f)) {
        if (strstr(line, "Atoms") || strstr(line, "Masses") ||
            strstr(line, "Velocities")) {
            section_pos = ftell(f) - (long)strlen(line);
            break;
        }
        // tokenize (sscanf literal tails match partially: "1 atom types"
        // would satisfy "%ld atoms")
        char buf[1024];
        strncpy(buf, line, sizeof buf - 1);
        buf[sizeof buf - 1] = 0;
        char* tok[8] = {nullptr};
        int nt = 0;
        for (char* t = strtok(buf, " \t\r\n"); t && nt < 8;
             t = strtok(nullptr, " \t\r\n"))
            tok[nt++] = t;
        if (nt >= 2 && !strcmp(tok[1], "atoms")) n = atol(tok[0]);
        else if (nt >= 3 && !strcmp(tok[1], "atom") && !strcmp(tok[2], "types"))
            n_types = atoi(tok[0]);
        else if (nt >= 4 && !strcmp(tok[2], "xlo")) { lo[0] = atof(tok[0]); hi[0] = atof(tok[1]); }
        else if (nt >= 4 && !strcmp(tok[2], "ylo")) { lo[1] = atof(tok[0]); hi[1] = atof(tok[1]); }
        else if (nt >= 4 && !strcmp(tok[2], "zlo")) { lo[2] = atof(tok[0]); hi[2] = atof(tok[1]); }
    }
    if (n <= 0 || section_pos < 0) { fclose(f); return -1; }

    *x = (double*)malloc(sizeof(double) * 3 * n);
    *v = (double*)malloc(sizeof(double) * 3 * n);
    *types = (int*)malloc(sizeof(int) * n);
    *masses = (double*)malloc(sizeof(double) * (n_types > 0 ? n_types : 1));
    memset(*v, 0, sizeof(double) * 3 * n);
    *has_v = 0;
    *has_masses = 0;

    fseek(f, section_pos, SEEK_SET);
    while (fgets(line, sizeof line, f)) {
        if (strstr(line, "Atoms")) {
            long got = 0;
            while (got < n && fgets(line, sizeof line, f)) {
                long id; int t; double px, py, pz;
                if (sscanf(line, "%ld %d %lf %lf %lf", &id, &t, &px, &py, &pz) == 5) {
                    long i = id - 1;
                    if (i < 0 || i >= n) { fclose(f); return -1; }
                    (*types)[i] = t;
                    (*x)[3 * i] = px; (*x)[3 * i + 1] = py; (*x)[3 * i + 2] = pz;
                    got++;
                }
            }
        } else if (strstr(line, "Masses")) {
            *has_masses = 1;
            int got = 0;
            while (got < n_types && fgets(line, sizeof line, f)) {
                int t; double m;
                if (sscanf(line, "%d %lf", &t, &m) == 2) {
                    if (t < 1 || t > n_types) { fclose(f); return -1; }
                    (*masses)[t - 1] = m;
                    got++;
                }
            }
        } else if (strstr(line, "Velocities")) {
            *has_v = 1;
            long got = 0;
            while (got < n && fgets(line, sizeof line, f)) {
                long id; double vx, vy, vz;
                if (sscanf(line, "%ld %lf %lf %lf", &id, &vx, &vy, &vz) == 4) {
                    long i = id - 1;
                    if (i < 0 || i >= n) { fclose(f); return -1; }
                    (*v)[3 * i] = vx; (*v)[3 * i + 1] = vy; (*v)[3 * i + 2] = vz;
                    got++;
                }
            }
        }
    }
    fclose(f);
    memcpy(box_lo, lo, sizeof lo);
    memcpy(box_hi, hi, sizeof hi);
    *n_types_out = n_types;
    return n;
}

// --------------------------------------------------------------- data write
int mzt_write_data(const char* path, long n, const double* x,
                   const int* types, const double* v, int has_v,
                   const double* box_lo, const double* box_hi, int n_types,
                   const char* comment) {
    FILE* f = fopen(path, "wb");
    if (!f) return -1;
    fprintf(f, "#%s\n", comment ? comment : "written by mzt_native");
    fprintf(f, "%ld atoms\n%d atom types\n", n, n_types);
    for (int d = 0; d < 3; d++)
        fprintf(f, "%.10g %.10g %clo %chi\n", box_lo[d], box_hi[d],
                "xyz"[d], "xyz"[d]);
    fprintf(f, "\nAtoms # atomic\n\n");
    for (long i = 0; i < n; i++)
        fprintf(f, "%ld %d %.10g %.10g %.10g\n", i + 1, types[i],
                x[3 * i], x[3 * i + 1], x[3 * i + 2]);
    if (has_v) {
        fprintf(f, "\nVelocities\n\n");
        for (long i = 0; i < n; i++)
            fprintf(f, "%ld %.10g %.10g %.10g\n", i + 1,
                    v[3 * i], v[3 * i + 1], v[3 * i + 2]);
    }
    fclose(f);
    return 0;
}

// ------------------------------------------------------- oriented crystal
// Rows of `orient` (9 doubles, row-major) are the crystal directions mapped
// to box x/y/z. basis: nb x 3 fractional coordinates. Returns atom count,
// fills *out (3N doubles, malloc'd). center_offset: lattice seeded from the
// box center (screw tool) vs corner (stgb). Half-open upper clip (the
// reference's inclusive clip duplicates periodic boundary sites).
long mzt_oriented_crystal(const double* orient, const double* length_box,
                          double a, const double* basis, int nb,
                          int center_offset, double clip_lo_tol,
                          double clip_hi_tol, double** out) {
    double r[3][3];
    for (int i = 0; i < 3; i++) {
        double nrm = 0;
        for (int j = 0; j < 3; j++) nrm += orient[3 * i + j] * orient[3 * i + j];
        nrm = sqrt(nrm);
        for (int j = 0; j < 3; j++) r[i][j] = orient[3 * i + j] / nrm;
    }
    double half[3] = {length_box[0] / 2, length_box[1] / 2, length_box[2] / 2};
    double diag = sqrt(half[0] * half[0] + half[1] * half[1] + half[2] * half[2]);
    int reach = (int)ceil(diag / a) + 2;
    const double eps = 1e-6;

    std::vector<double> pts;
    pts.reserve(1 << 20);
    for (int ci = -reach; ci <= reach; ci++)
        for (int cj = -reach; cj <= reach; cj++)
            for (int ck = -reach; ck <= reach; ck++)
                for (int b = 0; b < nb; b++) {
                    double p[3] = {(ci + basis[3 * b]) * a,
                                   (cj + basis[3 * b + 1]) * a,
                                   (ck + basis[3 * b + 2]) * a};
                    if (!center_offset)
                        for (int d = 0; d < 3; d++) p[d] -= half[d];
                    double q[3];
                    for (int d = 0; d < 3; d++)
                        q[d] = r[d][0] * p[0] + r[d][1] * p[1] + r[d][2] * p[2]
                               + half[d];
                    if (q[0] >= -clip_lo_tol - eps &&
                        q[0] < length_box[0] + clip_hi_tol - eps &&
                        q[1] >= -eps && q[1] < length_box[1] - eps &&
                        q[2] >= -eps && q[2] < length_box[2] - eps) {
                        pts.push_back(q[0]); pts.push_back(q[1]); pts.push_back(q[2]);
                    }
                }
    long n = (long)pts.size() / 3;
    *out = (double*)malloc(pts.size() * sizeof(double));
    memcpy(*out, pts.data(), pts.size() * sizeof(double));
    return n;
}

// ------------------------------------------------ screw displacement field
// u_z = b/(2 pi) * theta, theta in [0, 2 pi) around (core_x, core_y),
// matching the reference's branch convention (screw_…cpp:235-242).
void mzt_screw_uz(const double* x, long n, double core_x, double core_y,
                  double burgers, double* uz) {
    const double pi = 3.14159265358979;
    for (long i = 0; i < n; i++) {
        double rx = core_x - x[3 * i];
        double ry = core_y - x[3 * i + 1];
        double th = atan2(ry, rx);
        if (ry < 0) th += 2 * pi;
        uz[i] = burgers / (2 * pi) * th;
    }
}

}  // extern "C"
