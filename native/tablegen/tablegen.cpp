// Native count-rate table generation core.
//
// Replaces the role of the XSPEC (HEASOFT Fortran/C++) engine the reference
// invokes offline through mbproj2 (/root/reference/joxsz_funcs.py:652-681):
// evaluating absorbed, redshifted thermal spectra on the instrument energy
// grid and folding them through the RMF x ARF response for a grid of
// temperatures and metallicities.  Exposed to Python via a C ABI (ctypes).
//
// The math mirrors joxsz_tpu/tablegen/spectrum.py exactly (free-free
// continuum with Born Gaunt factor e^x K0(x), parametrised line complexes,
// Morrison & McCammon 1983 photoelectric absorption); the Python and native
// paths are cross-checked in tests.
//
// Build: make -C native/tablegen   ->  libjoxsz_tablegen.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// ---- modified Bessel K0 (Abramowitz & Stegun 9.8.5/9.8.6) -----------------
double bessel_k0(double x) {
  if (x <= 0.0) return INFINITY;
  if (x <= 2.0) {
    const double t = x * x / 4.0;
    // I0 for the log term
    double ti = x / 3.75, ti2 = ti * ti;
    const double i0 =
        1.0 + ti2 * (3.5156229 + ti2 * (3.0899424 + ti2 * (1.2067492 +
            ti2 * (0.2659732 + ti2 * (0.0360768 + ti2 * 0.0045813)))));
    return -std::log(x / 2.0) * i0 +
           (-0.57721566 + t * (0.42278420 + t * (0.23069756 +
             t * (0.03488590 + t * (0.00262698 + t * (0.00010750 +
             t * 0.00000740))))));
  }
  const double t = 2.0 / x;
  const double poly =
      1.25331414 + t * (-0.07832358 + t * (0.02189568 + t * (-0.01062446 +
          t * (0.00587872 + t * (-0.00251540 + t * 0.00053208)))));
  return poly * std::exp(-x) / std::sqrt(x);
}

// ---- free-free continuum ---------------------------------------------------
const double C_FF = 6.842e-38 * 2.41799e17 / 1.60218e-9 / std::sqrt(1.16045e7);
const double ZSUM_HHE = 1.0 + 4.0 * 0.0977;

double gaunt_ff(double E, double T) {
  double x = E / (2.0 * T);
  if (x < 1e-8) x = 1e-8;
  if (x > 600.0) x = 600.0;
  return std::sqrt(3.0) / M_PI * std::exp(x) * bessel_k0(x);
}

double ff_photon_emissivity(double E, double T) {
  double u = E / T;
  if (u > 600.0) u = 600.0;
  return C_FF * ZSUM_HHE * gaunt_ff(E, T) * std::exp(-u) / (E * std::sqrt(T));
}

// ---- line complexes (must match spectrum.py _LINES) -----------------------
// Asymmetric log-T responses; amplitudes calibrated against published
// APEC equivalent-width anchors (see spectrum.py docstring and
// tests/test_spectrum_anchors.py).
struct Line { double E0, sE, amp, lt0, sltL, sltR; };
const Line LINES[] = {
    {0.654, 0.020, 8.206e-16, -0.55, 0.30, 0.40},   // O VIII Ly-a
    {0.729, 0.025, 2.675e-15, -0.28, 0.22, 0.25},   // Fe XVII 2p-3s
    {0.826, 0.030, 3.478e-15, -0.25, 0.22, 0.28},   // Fe XVII/XVIII 2p-3d
    {0.950, 0.045, 4.013e-15, -0.10, 0.25, 0.30},   // Fe XIX/XX + Ne IX
    {1.070, 0.050, 3.210e-15,  0.00, 0.25, 0.32},   // Ne X + Fe XXI
    {1.170, 0.060, 2.140e-15,  0.15, 0.25, 0.35},   // Fe XXII-XXIV L
    {1.472, 0.030, 1.340e-16,  0.08, 0.30, 0.40},   // Mg XII Ly-a
    {1.865, 0.030, 3.927e-16,  0.00, 0.30, 0.30},   // Si XIII He-a
    {2.006, 0.030, 9.786e-17,  0.26, 0.30, 0.40},   // Si XIV Ly-a
    {2.461, 0.035, 1.248e-16,  0.15, 0.30, 0.30},   // S XV He-a
    {2.623, 0.035, 3.156e-17,  0.45, 0.30, 0.40},   // S XVI Ly-a
    {3.140, 0.045, 3.000e-17,  0.30, 0.30, 0.35},   // Ar XVII He-a
    {3.323, 0.045, 1.200e-17,  0.57, 0.30, 0.45},   // Ar XVIII Ly-a
    {3.902, 0.050, 2.200e-17,  0.40, 0.30, 0.35},   // Ca XIX He-a
    {4.107, 0.050, 1.200e-17,  0.67, 0.30, 0.45},   // Ca XX Ly-a
    {6.685, 0.060, 5.164e-16,  0.10, 0.606, 0.361},  // Fe XXV He-a
    {6.966, 0.050, 6.952e-17,  0.90, 0.190, 0.342},  // Fe XXVI Ly-a
    {7.850, 0.090, 7.000e-17,  0.60, 0.50, 0.45},   // Fe K-beta + Ni K-a
};
const int N_LINES = sizeof(LINES) / sizeof(LINES[0]);

double line_photon_emissivity(double E, double T, double Z) {
  if (Z <= 0.0) return 0.0;
  const double logT = std::log10(T);
  double total = 0.0;
  for (int k = 0; k < N_LINES; ++k) {
    const Line& L = LINES[k];
    const double slt = logT < L.lt0 ? L.sltL : L.sltR;
    const double dt = (logT - L.lt0) / slt;
    double boltz = L.E0 / (T > 1e-3 ? T : 1e-3);
    if (boltz > 600.0) boltz = 600.0;
    const double t_resp = std::exp(-0.5 * dt * dt) * std::exp(-boltz);
    const double de = (E - L.E0) / L.sE;
    const double prof =
        std::exp(-0.5 * de * de) / (L.sE * std::sqrt(2.0 * M_PI));
    total += prof * L.amp * t_resp;
  }
  return Z * total;
}

double photon_emissivity(double E, double T, double Z) {
  return ff_photon_emissivity(E, T) + line_photon_emissivity(E, T, Z);
}

// ---- Morrison & McCammon 1983 ---------------------------------------------
struct MMRow { double lo, hi, c0, c1, c2; };
const MMRow MM83[] = {
    {0.030, 0.100, 17.3, 608.1, -2150.0}, {0.100, 0.284, 34.6, 267.9, -476.1},
    {0.284, 0.400, 78.1, 18.8, 4.3},      {0.400, 0.532, 71.4, 66.8, -51.4},
    {0.532, 0.707, 95.5, 145.8, -61.1},   {0.707, 0.867, 308.9, -380.6, 294.0},
    {0.867, 1.303, 120.6, 169.3, -47.7},  {1.303, 1.840, 141.3, 146.8, -31.5},
    {1.840, 2.471, 202.7, 104.7, -17.0},  {2.471, 3.210, 342.7, 18.7, 0.0},
    {3.210, 4.038, 352.2, 18.7, 0.0},     {4.038, 7.111, 433.9, -2.4, 0.75},
    {7.111, 8.331, 629.0, 30.9, 0.0},     {8.331, 10.000, 701.2, 25.2, 0.0},
};
const int N_MM = sizeof(MM83) / sizeof(MM83[0]);

double phabs_transmission(double E, double NH_1022) {
  double Ec = E < 0.030 ? 0.030 : (E > 10.0 ? 10.0 : E);
  int idx = N_MM - 1;
  for (int i = 0; i < N_MM; ++i) {
    if (Ec <= MM83[i].hi) { idx = i; break; }
  }
  const MMRow& m = MM83[idx];
  const double sigma = (m.c0 + m.c1 * Ec + m.c2 * Ec * Ec) / (Ec * Ec * Ec);
  return std::exp(-NH_1022 * sigma * 1e-2);
}

}  // namespace

extern "C" {

// Observed photon flux density per unit XSPEC norm on an energy grid.
//   E_obs[nE] (keV, observed) -> out[nE] (ph/cm^2/s/keV)
void jx_observed_spectrum(const double* E_obs, int64_t nE, double T_keV,
                          double Z_solar, double z, double NH_1022,
                          double* out) {
  const double zf = 1.0 + z;
  for (int64_t i = 0; i < nE; ++i) {
    const double lam = photon_emissivity(E_obs[i] * zf, T_keV, Z_solar);
    out[i] = 1e14 * lam / zf * phabs_transmission(E_obs[i], NH_1022);
  }
}

// Full table generation: fold the spectrum through the (nE x nC) response
// for every (T, Z) grid point and sum the channels of each band.
//   resp:        dense RMF x ARF, row-major (nE x nC)
//   e_mid/e_wid: energy bin centres/widths (keV, observed-frame grid)
//   band_mask:   (n_band x nC) 0/1 channel membership
//   T_grid[nT]:  temperatures (keV); Z_grid[nZ]: metallicities (solar)
//   out:         (nZ x nT x n_band) count rates per unit norm
void jx_count_rate_table(const double* resp, const double* e_mid,
                         const double* e_wid, int64_t nE, int64_t nC,
                         const double* band_mask, int64_t n_band,
                         const double* T_grid, int64_t nT,
                         const double* Z_grid, int64_t nZ, double z,
                         double NH_1022, double* out) {
  std::vector<double> spec(nE);
  std::vector<double> chan(nC);
  // phabs transmission depends only on (E, NH): hoist it out of the
  // (Z, T) loops instead of re-evaluating it nZ*nT times (r4 review).
  // The combined expression below keeps the exact multiply order of
  // jx_observed_spectrum + the e_wid pass, so results are bit-identical.
  const double zf = 1.0 + z;
  std::vector<double> trans(nE);
  for (int64_t e = 0; e < nE; ++e)
    trans[e] = phabs_transmission(e_mid[e], NH_1022);
  for (int64_t iz = 0; iz < nZ; ++iz) {
    for (int64_t it = 0; it < nT; ++it) {
      for (int64_t e = 0; e < nE; ++e) {
        const double lam =
            photon_emissivity(e_mid[e] * zf, T_grid[it], Z_grid[iz]);
        spec[e] = 1e14 * lam / zf * trans[e] * e_wid[e];
      }
      // channel counts = spec^T . resp
      std::memset(chan.data(), 0, nC * sizeof(double));
      for (int64_t e = 0; e < nE; ++e) {
        const double s = spec[e];
        if (s == 0.0) continue;
        const double* row = resp + e * nC;
        for (int64_t c = 0; c < nC; ++c) chan[c] += s * row[c];
      }
      for (int64_t b = 0; b < n_band; ++b) {
        const double* mask = band_mask + b * nC;
        double acc = 0.0;
        for (int64_t c = 0; c < nC; ++c) acc += mask[c] * chan[c];
        out[(iz * nT + it) * n_band + b] = acc;
      }
    }
  }
}

// Unabsorbed bolometric energy flux per unit norm (erg/cm^2/s), log-spaced
// trapezoid over [e_lo, e_hi] observed keV.
double jx_bolometric_flux(double T_keV, double Z_solar, double z, double e_lo,
                          double e_hi, int64_t n) {
  const double keV_erg = 1.6021766e-9;
  const double zf = 1.0 + z;
  const double lstep = std::log(e_hi / e_lo) / (double)(n - 1);
  double prev_E = e_lo;
  double prev_f = 1e14 * photon_emissivity(e_lo * zf, T_keV, Z_solar) / zf *
                  e_lo * keV_erg;
  double acc = 0.0;
  for (int64_t i = 1; i < n; ++i) {
    const double E = e_lo * std::exp(lstep * (double)i);
    const double f =
        1e14 * photon_emissivity(E * zf, T_keV, Z_solar) / zf * E * keV_erg;
    acc += 0.5 * (prev_f + f) * (E - prev_E);
    prev_E = E;
    prev_f = f;
  }
  return acc;
}

}  // extern "C"
