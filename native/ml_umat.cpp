// ml_umat.cpp — native SVC-yield-function constitutive kernel.
//
// C++ implementation of the machine-learned (RBF-SVC) elastic-plastic
// constitutive update, with a C ABI whose parameter layout matches the
// trained-parameter export of Material.export_MLparam (props array, 8 values
// per CSV line) and the Abaqus UMAT state-variable contract
// (statev = plastic strain tensor, PEEQ, substep count).  This is the
// native equivalent of the reference Fortran UMAT (examples/UMAT/ml_umat.f):
// same props layout, same algorithm family (elastic predictor, bisection
// yield-onset search along the stress ray, substepped associated flow with
// consistent tangent), written from scratch.
//
// Exported entry points (extern "C"):
//   mlumat_fsvc        — SVC decision function at a (scaled) feature vector
//   mlumat_grad_fsvc   — gradient of the decision function w.r.t. stress
//   mlumat_step        — full constitutive update for one material point
//                        (standard Voigt component order 11,22,33,23,13,12)
//   mlumat_step_abaqus — same, Abaqus component order (11,22,33,12,13,23)
//
// Build: g++ -O3 -march=native -shared -fPIC ml_umat.cpp -o libmlumat.so
#include <cmath>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

struct Params {
    int nsv;          // number of support vectors
    int ndof;         // feature dimension (6 for pure stress features)
    double C11, C12, C44;
    double rho;       // SVC intercept
    double gamma;     // RBF kernel width
    double epc;       // critical plastic strain at yield onset
    double scale_seq; // stress feature scale
    double scale_wh;  // work-hardening feature scale
    double CV[6][6];  // full elastic stiffness
    bool dev_only;
    const double* dc; // dual coefficients [nsv]
    const double* sv; // support vectors [nsv * ndof]
};

Params parse_props(const double* props) {
    Params p{};
    p.nsv = static_cast<int>(props[0] + 0.5);
    p.ndof = static_cast<int>(props[1] + 0.5);
    p.C11 = props[2];
    p.C12 = props[3];
    p.C44 = props[4];
    p.rho = props[5];
    p.gamma = props[6];
    p.epc = props[7];
    p.scale_seq = props[8];
    p.scale_wh = props[9];
    std::memset(p.CV, 0, sizeof(p.CV));
    if (props[10] > 0.) {  // full anisotropic CV stored
        p.CV[0][0] = p.C11;
        p.CV[1][1] = props[10];
        p.CV[2][2] = props[11];
        p.CV[0][1] = p.CV[1][0] = p.C12;
        p.CV[0][2] = p.CV[2][0] = props[12];
        p.CV[1][2] = p.CV[2][1] = props[13];
        p.CV[3][3] = p.C44;
        p.CV[4][4] = props[14];
        p.CV[5][5] = props[15];
    } else {               // cubic from C11/C12/C44
        for (int i = 0; i < 3; ++i)
            for (int j = 0; j < 3; ++j)
                p.CV[i][j] = (i == j) ? p.C11 : p.C12;
        p.CV[3][3] = p.CV[4][4] = p.CV[5][5] = p.C44;
    }
    p.dev_only = props[16] < -0.5;
    p.dc = props + 29;
    p.sv = props + 29 + p.nsv;
    return p;
}

inline void deviator(const double s[6], double d[6]) {
    const double pmean = (s[0] + s[1] + s[2]) / 3.0;
    d[0] = s[0] - pmean;
    d[1] = s[1] - pmean;
    d[2] = s[2] - pmean;
    d[3] = s[3];
    d[4] = s[4];
    d[5] = s[5];
}

inline double seq_j2(const double s[6]) {
    const double d01 = s[0] - s[1], d12 = s[1] - s[2], d20 = s[2] - s[0];
    return std::sqrt(0.5 * (d01 * d01 + d12 * d12 + d20 * d20)
                     + 3.0 * (s[3] * s[3] + s[4] * s[4] + s[5] * s[5]));
}

inline double eps_eq(const double e[6]) {
    return std::sqrt(2.0 / 3.0 * (e[0] * e[0] + e[1] * e[1] + e[2] * e[2]
                     + 0.5 * (e[3] * e[3] + e[4] * e[4] + e[5] * e[5])));
}

// Build the SVC feature vector: scaled (deviatoric) stress, then for
// work-hardening parameter sets the scaled plastic strain (reference UMAT
// calcFSVC: hs(7:12) = eplas/scale_wh); any further feature dofs
// (acc_strain, max_stress, flag) enter at zero.
inline int build_features(const Params& p, const double sig[6],
                          const double epl[6], double feat[/*ndof*/]) {
    double work[6];
    const double* s = sig;
    if (p.dev_only) {
        deviator(sig, work);
        s = work;
    }
    for (int k = 0; k < 6; ++k) feat[k] = s[k] / p.scale_seq;
    int nw = p.ndof < 12 ? p.ndof : 12;
    for (int k = 6; k < nw; ++k)
        feat[k] = (epl ? epl[k - 6] : 0.0) / p.scale_wh;
    for (int k = nw; k < p.ndof; ++k) feat[k] = 0.0;
    return p.ndof;
}

// Feature-vector work buffer: stack storage for the common parameter sets
// (ndof <= 32), heap for texture-conditioned exports (e.g. GSH_37 gives
// ndof = 52) — props[1] is caller-controlled and must never index past a
// fixed stack array.
struct FeatBuf {
    double stack[32];
    std::vector<double> heap;
    double* get(int ndof) {
        if (ndof <= 32) return stack;
        heap.assign(static_cast<size_t>(ndof), 0.0);
        return heap.data();
    }
};

// SVC decision function on the scaled features.
double fsvc(const Params& p, const double sig[6], const double epl[6]) {
    FeatBuf fb;
    double* feat = fb.get(p.ndof);
    const int nd = build_features(p, sig, epl, feat);
    double acc = p.rho;
    for (int i = 0; i < p.nsv; ++i) {
        const double* v = p.sv + i * p.ndof;
        double d2 = 0.0;
        for (int k = 0; k < nd; ++k) {
            const double h = feat[k] - v[k];
            d2 += h * h;
        }
        acc += p.dc[i] * std::exp(-p.gamma * d2);
    }
    return acc;
}

// Gradient of the decision function w.r.t. (unscaled) stress; for
// work-hardening parameter sets also extracts the hardening modulus from
// the plastic-strain feature components (reference UMAT calcGradFSVC).
void grad_fsvc(const Params& p, const double sig[6], const double epl[6],
               double grad[6], double* khard_out) {
    FeatBuf fb, gb, hb;
    double* feat = fb.get(p.ndof);
    const int nd = build_features(p, sig, epl, feat);
    double* g = gb.get(p.ndof);
    std::fill(g, g + p.ndof, 0.0);
    double* h = hb.get(p.ndof);
    for (int i = 0; i < p.nsv; ++i) {
        const double* v = p.sv + i * p.ndof;
        double d2 = 0.0;
        for (int k = 0; k < nd; ++k) {
            h[k] = feat[k] - v[k];
            d2 += h[k] * h[k];
        }
        const double w = p.dc[i] * std::exp(-p.gamma * d2);
        for (int k = 0; k < nd; ++k) g[k] += w * (-2.0 * p.gamma) * h[k];
    }
    for (int k = 0; k < 6; ++k) grad[k] = g[k] / p.scale_seq;
    if (khard_out) {
        double kh = 0.0;
        const int nw = p.ndof < 12 ? p.ndof : 12;
        for (int k = 6; k < nw; ++k)
            kh -= g[k] * p.scale_seq / p.scale_wh;
        *khard_out = kh > 0.0 ? kh : 0.0;
    }
}

// Bisection along the ray t * su for the yield onset (fsvc(t su) = 0).
double find_root(const Params& p, const double su[6], const double epl[6],
                 double t0, double t1, int maxiter = 80, double xtol = 1e-6) {
    double s[6];
    auto f = [&](double t) {
        for (int k = 0; k < 6; ++k) s[k] = t * su[k];
        return fsvc(p, s, epl);
    };
    double f0 = f(t0);
    double f1 = f(t1);
    int guard = 0;
    while (f0 > 0. && t0 > 1e-8 && guard++ < 200) { t0 *= 0.95; f0 = f(t0); }
    guard = 0;
    while (f1 < 0. && guard++ < 200) { t1 *= 1.05; f1 = f(t1); }
    if (f0 * f1 > 0.) return 0.5 * (t0 + t1);
    for (int it = 0; it < maxiter && (t1 - t0) > xtol; ++it) {
        const double tm = 0.5 * (t0 + t1);
        const double fm = f(tm);
        if (fm * f0 <= 0.) { t1 = tm; f1 = fm; }
        else { t0 = tm; f0 = fm; }
    }
    return 0.5 * (t0 + t1);
}

inline void matvec6(const double A[6][6], const double x[6], double y[6]) {
    for (int i = 0; i < 6; ++i) {
        double acc = 0.0;
        for (int j = 0; j < 6; ++j) acc += A[i][j] * x[j];
        y[i] = acc;
    }
}

// Associated flow + consistent tangent for one substep.
void flow_step(const Params& p, double sig[6], double epl[6],
               const double deps[6], double ddsdde[6][6]) {
    double a[6];
    double khard = 0.0;
    grad_fsvc(p, sig, epl, a, &khard);
    double ca[6];
    matvec6(p.CV, a, ca);
    double aCa = 0.0, aCde = 0.0;
    for (int k = 0; k < 6; ++k) {
        aCa += ca[k] * a[k];
        aCde += ca[k] * deps[k];
    }
    const double denom = aCa + khard;
    const double lam = denom > 1e-12 ? aCde / denom : 0.0;
    // tangent Ct = C - (Ca (x) Ca) / denom
    for (int i = 0; i < 6; ++i)
        for (int j = 0; j < 6; ++j)
            ddsdde[i][j] = p.CV[i][j] - (denom > 1e-12
                           ? ca[i] * ca[j] / denom : 0.0);
    double dsig[6];
    matvec6(*reinterpret_cast<const double(*)[6][6]>(&ddsdde[0][0]), deps, dsig);
    for (int k = 0; k < 6; ++k) {
        sig[k] += dsig[k];
        epl[k] += lam * a[k];
    }
}

}  // namespace

extern "C" {

double mlumat_fsvc(const double* props, const double* sig) {
    const Params p = parse_props(props);
    return fsvc(p, sig, nullptr);
}

void mlumat_grad_fsvc(const double* props, const double* sig, double* grad) {
    const Params p = parse_props(props);
    grad_fsvc(p, sig, nullptr, grad, nullptr);
}

// Work-hardening-aware variants: plastic strain enters the feature vector;
// grad also returns the extracted hardening modulus.
double mlumat_fsvc_wh(const double* props, const double* sig,
                      const double* epl) {
    const Params p = parse_props(props);
    return fsvc(p, sig, epl);
}

double mlumat_grad_fsvc_wh(const double* props, const double* sig,
                           const double* epl, double* grad) {
    const Params p = parse_props(props);
    double kh = 0.0;
    grad_fsvc(p, sig, epl, grad, &kh);
    return kh;
}

// Full constitutive update for one material point, standard Voigt order.
//   stress[6]   in/out: stress at start/end of increment
//   statev[14]  in/out: plastic strain (6), PEEQ, nsubsteps, 6 spare
//   dstran[6]   strain increment
//   ddsdde[36]  out: consistent tangent (row-major 6x6)
// Returns the yield function value at the end of the increment.
double mlumat_step(const double* props, double* stress, double* statev,
                   const double* dstran, double* ddsdde, int max_substeps) {
    const Params p = parse_props(props);
    double sig[6], epl[6], deps[6];
    std::memcpy(sig, stress, sizeof(sig));
    std::memcpy(epl, statev, sizeof(epl));
    std::memcpy(deps, dstran, sizeof(deps));

    // elastic predictor
    double dsig[6];
    matvec6(p.CV, deps, dsig);
    double sig_tr[6];
    for (int k = 0; k < 6; ++k) sig_tr[k] = sig[k] + dsig[k];
    const double fy_tr = fsvc(p, sig_tr, epl);
    double (*D)[6] = reinterpret_cast<double(*)[6]>(ddsdde);

    if (fy_tr < 0.) {  // purely elastic
        std::memcpy(stress, sig_tr, sizeof(sig_tr));
        for (int i = 0; i < 6; ++i)
            for (int j = 0; j < 6; ++j) D[i][j] = p.CV[i][j];
        statev[7] = 0.;
        return fy_tr;
    }

    // split the increment at the yield onset (bisection along the stress ray)
    double el_frac = 0.0;
    if (fsvc(p, sig, epl) < -1e-3) {
        const double seq0 = seq_j2(sig);
        const double seq1 = seq_j2(sig_tr);
        if (seq1 > seq0 + 1e-12) {
            double su[6];
            const double inv = 1.0 / seq1;
            for (int k = 0; k < 6; ++k) su[k] = sig_tr[k] * inv;
            const double t_y = find_root(p, su, epl, seq0 * 0.5, seq1);
            el_frac = (t_y - seq0) / (seq1 - seq0);
            if (el_frac < 0.) el_frac = 0.;
            if (el_frac > 1.) el_frac = 1.;
        }
        for (int k = 0; k < 6; ++k) sig[k] += el_frac * dsig[k];
    }

    // substepped plastic update over the remaining strain
    const int nsub = max_substeps > 0 ? max_substeps : 20;
    double deps_r[6];
    for (int k = 0; k < 6; ++k)
        deps_r[k] = deps[k] * (1.0 - el_frac) / nsub;
    double fy = fy_tr;
    for (int it = 0; it < nsub; ++it) {
        flow_step(p, sig, epl, deps_r, D);
        fy = fsvc(p, sig, epl);
        if (fy > 0.) {
            // relax the stress radially back to the locus
            const double seq = seq_j2(sig);
            if (seq > 1e-8) {
                double su[6];
                for (int k = 0; k < 6; ++k) su[k] = sig[k] / seq;
                const double t_y = find_root(p, su, epl, 0.5 * seq, seq);
                for (int k = 0; k < 6; ++k) sig[k] = su[k] * t_y;
                fy = fsvc(p, sig, epl);
            }
        }
    }
    std::memcpy(stress, sig, 6 * sizeof(double));
    std::memcpy(statev, epl, 6 * sizeof(double));
    statev[6] = eps_eq(epl);
    statev[7] = static_cast<double>(nsub);
    return fy;
}

// Abaqus component convention (11,22,33,12,13,23): swap entries 3 <-> 5 on
// the way in and out (the reference UMAT does the same swap,
// ml_umat.f:157-174).
double mlumat_step_abaqus(const double* props, double* stress, double* statev,
                          const double* dstran, double* ddsdde,
                          int max_substeps) {
    auto swap_in = [](const double* src, double* dst) {
        dst[0] = src[0]; dst[1] = src[1]; dst[2] = src[2];
        dst[3] = src[5]; dst[4] = src[4]; dst[5] = src[3];
    };
    double s[6], de[6], sv[14], dd[36];
    swap_in(stress, s);
    swap_in(dstran, de);
    std::memcpy(sv, statev, sizeof(sv));
    std::swap(sv[3], sv[5]);
    const double fy = mlumat_step(props, s, sv, de, dd, max_substeps);
    swap_in(s, stress);
    std::swap(sv[3], sv[5]);
    std::memcpy(statev, sv, sizeof(sv));
    // remap tangent rows/cols 3 <-> 5
    const int map[6] = {0, 1, 2, 5, 4, 3};
    for (int i = 0; i < 6; ++i)
        for (int j = 0; j < 6; ++j)
            ddsdde[i * 6 + j] = dd[map[i] * 6 + map[j]];
    return fy;
}

// ---------------------------------------------------------------------
// Fortran-ABI Abaqus user-material entry point.
//
// Matches the standard Abaqus UMAT argument list (all arguments passed by
// reference, CHARACTER*80 CMNAME with the gfortran hidden length argument
// at the end), so an Abaqus build can link this library directly in place
// of a Fortran UMAT:
//
//   abaqus job=femBlock user=libmlumat.so   (or link the .o)
//
// Delegates to mlumat_step_abaqus (Abaqus Voigt component convention,
// 11,22,33,12,13,23) and maintains the Abaqus state:
//   statev(1:6)  plastic strain tensor (Abaqus order)
//   statev(7)    PEEQ
//   statev(8)    substep count of the last increment
// SSE/SPD are updated with the trapezoidal elastic / plastic work of the
// increment.  DDSDDE is written column-major (Fortran layout); the
// consistent tangent of the flow rule is symmetric, so the transpose is
// exact.  Only NTENS == 6 (three-dimensional / generalized plane strain)
// is supported — same restriction as the reference Fortran UMAT.
extern "C" void umat_(
    double* stress, double* statev, double* ddsdde, double* sse,
    double* spd, double* scd, double* rpl, double* ddsddt, double* drplde,
    double* drpldt, double* stran, double* dstran, double* time,
    double* dtime, double* temp, double* dtemp, double* predef,
    double* dpred, char* cmname, const int* ndi, const int* nshr,
    const int* ntens, const int* nstatv, const double* props,
    const int* nprops, const double* coords, const double* drot,
    double* pnewdt, const double* celent, const double* dfgrd0,
    const double* dfgrd1, const int* noel, const int* npt,
    const int* layer, const int* kspt, const int* kstep, const int* kinc,
    size_t cmname_len) {
    (void)scd; (void)rpl; (void)ddsddt; (void)drplde; (void)drpldt;
    (void)stran; (void)time; (void)dtime; (void)temp; (void)dtemp;
    (void)predef; (void)dpred; (void)cmname; (void)ndi; (void)nshr;
    (void)nprops; (void)coords; (void)drot; (void)pnewdt; (void)celent;
    (void)dfgrd0; (void)dfgrd1; (void)noel; (void)npt; (void)layer;
    (void)kspt; (void)kstep; (void)kinc; (void)cmname_len;
    if (*ntens != 6) return;  // 3-D stress states only (as the reference)

    double sv[14] = {0.};
    const int nsv_copy = *nstatv < 14 ? *nstatv : 14;
    std::memcpy(sv, statev, nsv_copy * sizeof(double));
    double s0[6], epl0[6];
    std::memcpy(s0, stress, sizeof(s0));
    std::memcpy(epl0, sv, sizeof(epl0));

    double dd[36];
    mlumat_step_abaqus(props, stress, sv, dstran, dd, 0);

    std::memcpy(statev, sv, nsv_copy * sizeof(double));
    // Fortran column-major tangent (symmetric -> transpose is exact, but
    // written explicitly for generality)
    for (int i = 0; i < 6; ++i)
        for (int j = 0; j < 6; ++j)
            ddsdde[j * 6 + i] = dd[i * 6 + j];
    // trapezoidal work increments (engineering shear strains, so the
    // single product counts each shear component once)
    double w_pl = 0., w_tot = 0.;
    for (int k = 0; k < 6; ++k) {
        const double smid = 0.5 * (s0[k] + stress[k]);
        const double depl = sv[k] - epl0[k];
        w_pl += smid * depl;
        w_tot += smid * dstran[k];
    }
    if (spd) *spd += w_pl;
    if (sse) *sse += w_tot - w_pl;
}

}  // extern "C"
