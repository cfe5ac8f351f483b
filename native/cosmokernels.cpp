// fastbox_tpu native cosmology kernels.
//
// The reference delegates its cosmology to the CCL C library (SURVEY.md
// §2.3); this library plays the same role for the rebuild's host-side
// setup: Eisenstein-Hu (1998) transfer function, linear-growth ODE,
// comoving distances, and the sigma^2(R) window integrals that dominate
// halofit table construction.  Exposed through a plain C ABI and loaded
// from Python via ctypes (fastbox_tpu/native.py), with a pure-Python
// fallback when the shared library is unavailable.
//
// Build:  g++ -O3 -shared -fPIC -o libcosmokernels.so cosmokernels.cpp
#include <cmath>
#include <vector>

namespace {

struct Cosmo {
  double omega_m, omega_b, omega_c, omega_r, omega_l;
  double h, n_s, t_cmb, w0;
};

double e_of_a(const Cosmo& c, double a) {
  return std::sqrt(c.omega_m / (a * a * a) + c.omega_r / (a * a * a * a) +
                   c.omega_l * std::pow(a, -3.0 * (1.0 + c.w0)));
}

// Composite-Simpson integral of f over [lo, hi] with n (even) intervals.
template <typename F>
double simpson(F f, double lo, double hi, int n) {
  if (n % 2) n += 1;
  const double h = (hi - lo) / n;
  double s = f(lo) + f(hi);
  for (int i = 1; i < n; ++i) s += f(lo + i * h) * (i % 2 ? 4.0 : 2.0);
  return s * h / 3.0;
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------
// Eisenstein & Hu (1998) full transfer function (astro-ph/9709112).
// Mirrors fastbox_tpu/cosmology/eisenstein_hu.py exactly.
// ---------------------------------------------------------------------
void eh98_transfer(double omega_c, double omega_b, double h, double t_cmb,
                   const double* k, double* T, long n) {
  const double om = omega_c + omega_b;
  const double om_mh2 = om * h * h;
  const double om_bh2 = omega_b * h * h;
  const double fb = omega_b / om, fc = omega_c / om;
  const double theta = t_cmb / 2.7;

  const double z_eq = 2.50e4 * om_mh2 / std::pow(theta, 4);
  const double k_eq = 7.46e-2 * om_mh2 / (theta * theta);

  const double b1 = 0.313 * std::pow(om_mh2, -0.419) *
                    (1.0 + 0.607 * std::pow(om_mh2, 0.674));
  const double b2 = 0.238 * std::pow(om_mh2, 0.223);
  const double z_d = 1291.0 * std::pow(om_mh2, 0.251) /
                     (1.0 + 0.659 * std::pow(om_mh2, 0.828)) *
                     (1.0 + b1 * std::pow(om_bh2, b2));

  auto R_of_z = [&](double z) {
    return 31.5 * om_bh2 / std::pow(theta, 4) * (1.0e3 / z);
  };
  const double R_eq = R_of_z(z_eq), R_d = R_of_z(z_d);

  const double s = (2.0 / (3.0 * k_eq)) * std::sqrt(6.0 / R_eq) *
                   std::log((std::sqrt(1.0 + R_d) + std::sqrt(R_d + R_eq)) /
                            (1.0 + std::sqrt(R_eq)));

  const double k_silk = 1.6 * std::pow(om_bh2, 0.52) *
                        std::pow(om_mh2, 0.73) *
                        (1.0 + std::pow(10.4 * om_mh2, -0.95));

  const double a1 = std::pow(46.9 * om_mh2, 0.670) *
                    (1.0 + std::pow(32.1 * om_mh2, -0.532));
  const double a2 = std::pow(12.0 * om_mh2, 0.424) *
                    (1.0 + std::pow(45.0 * om_mh2, -0.582));
  const double alpha_c = std::pow(a1, -fb) * std::pow(a2, -fb * fb * fb);
  const double bb1 = 0.944 / (1.0 + std::pow(458.0 * om_mh2, -0.708));
  const double bb2 = std::pow(0.395 * om_mh2, -0.0266);
  const double beta_c = 1.0 / (1.0 + bb1 * (std::pow(fc, bb2) - 1.0));

  const double y = (1.0 + z_eq) / (1.0 + z_d);
  const double sq = std::sqrt(1.0 + y);
  const double G_y = y * (-6.0 * sq +
                          (2.0 + 3.0 * y) * std::log((sq + 1.0) / (sq - 1.0)));
  const double alpha_b =
      2.07 * k_eq * s * std::pow(1.0 + R_d, -0.75) * G_y;
  const double beta_b = 0.5 + fb + (3.0 - 2.0 * fb) *
                        std::sqrt(std::pow(17.2 * om_mh2, 2) + 1.0);
  const double beta_node = 8.41 * std::pow(om_mh2, 0.435);

  auto T0 = [&](double q, double alpha, double beta) {
    const double C = 14.2 / alpha + 386.0 / (1.0 + 69.9 * std::pow(q, 1.08));
    const double lnarg = std::log(M_E + 1.8 * beta * q);
    return lnarg / (lnarg + C * q * q);
  };

  for (long i = 0; i < n; ++i) {
    const double kk = k[i];
    const double q = kk / (13.41 * k_eq);
    const double ks = kk * s;

    const double f = 1.0 / (1.0 + std::pow(ks / 5.4, 4));
    const double Tc =
        f * T0(q, 1.0, beta_c) + (1.0 - f) * T0(q, alpha_c, beta_c);

    const double s_tilde =
        s / std::cbrt(1.0 + std::pow(beta_node / std::max(ks, 1e-30), 3));
    const double x = kk * s_tilde;
    const double j0 = (x > 1e-8) ? std::sin(x) / x : 1.0 - x * x / 6.0;
    const double Tb =
        (T0(q, 1.0, 1.0) / (1.0 + std::pow(ks / 5.2, 2)) +
         alpha_b / (1.0 + std::pow(beta_b / std::max(ks, 1e-30), 3)) *
             std::exp(-std::pow(kk / k_silk, 1.4))) *
        j0;

    T[i] = fb * Tb + fc * Tc;
  }
}

// ---------------------------------------------------------------------
// Linear growth ODE in x = ln a (RK4, fixed step), matter-domination ICs.
// Outputs D normalised to D(a=1)=1 and f = dlnD/dlna on the lna grid.
// ---------------------------------------------------------------------
void growth_tables(double omega_m, double omega_r, double omega_l, double w0,
                   double a_min, long n, double* a_out, double* D_out,
                   double* f_out) {
  Cosmo c{omega_m, 0, 0, omega_r, omega_l, 0, 0, 0, w0};
  auto rhs = [&](double lna, double D, double dD, double* oD, double* odD) {
    const double a = std::exp(lna);
    const double E2 = e_of_a(c, a) * e_of_a(c, a);
    const double dlnE =
        -0.5 *
        (3.0 * omega_m / (a * a * a) + 4.0 * omega_r / (a * a * a * a) +
         3.0 * (1.0 + w0) * omega_l * std::pow(a, -3.0 * (1.0 + w0))) /
        E2;
    const double om_a = omega_m / (a * a * a) / E2;
    *oD = dD;
    *odD = -(2.0 + dlnE) * dD + 1.5 * om_a * D;
  };

  const double lna0 = std::log(a_min);
  const double h = (0.0 - lna0) / (n - 1);
  double D = a_min, dD = a_min;
  const int sub = 8;  // substeps per output interval
  for (long i = 0; i < n; ++i) {
    const double lna = lna0 + i * h;
    a_out[i] = std::exp(lna);
    D_out[i] = D;
    f_out[i] = dD / D;
    if (i == n - 1) break;
    double x = lna;
    const double hs = h / sub;
    for (int ss = 0; ss < sub; ++ss) {
      double k1D, k1dD, k2D, k2dD, k3D, k3dD, k4D, k4dD;
      rhs(x, D, dD, &k1D, &k1dD);
      rhs(x + hs / 2, D + hs / 2 * k1D, dD + hs / 2 * k1dD, &k2D, &k2dD);
      rhs(x + hs / 2, D + hs / 2 * k2D, dD + hs / 2 * k2dD, &k3D, &k3dD);
      rhs(x + hs, D + hs * k3D, dD + hs * k3dD, &k4D, &k4dD);
      D += hs / 6.0 * (k1D + 2 * k2D + 2 * k3D + k4D);
      dD += hs / 6.0 * (k1dD + 2 * k2dD + 2 * k3dD + k4dD);
      x += hs;
    }
  }
  const double Dn = D_out[n - 1];
  for (long i = 0; i < n; ++i) D_out[i] /= Dn;
}

// ---------------------------------------------------------------------
// Comoving radial distance chi(a) in Mpc (flat), Simpson in ln a.
// ---------------------------------------------------------------------
double comoving_distance(double omega_m, double omega_r, double omega_l,
                         double w0, double h, double a) {
  if (a >= 1.0) return 0.0;
  Cosmo c{omega_m, 0, 0, omega_r, omega_l, 0, 0, 0, w0};
  const double C_KMS = 299792.458;
  auto f = [&](double lna) {
    const double aa = std::exp(lna);
    return 1.0 / (aa * e_of_a(c, aa));
  };
  const double val = simpson(f, std::log(a), 0.0, 2048);
  return (C_KMS / (100.0 * h)) * val;
}

// ---------------------------------------------------------------------
// sigma^2(R) moments with a Gaussian window over a tabulated ln P(ln k):
// out[0] = sigma^2, out[1] = dln sigma^2/dlnR, out[2] = d^2 ln s^2/dlnR^2.
// Mirrors cosmology/halofit._sigma2_moments.
// ---------------------------------------------------------------------
void sigma2_gauss_moments(const double* lnk, const double* lnp, long n,
                          double R, double* out) {
  auto interp = [&](double x) {
    if (x <= lnk[0]) return lnp[0];
    if (x >= lnk[n - 1]) return lnp[n - 1];
    // log-uniform table: direct index
    const double dx = (lnk[n - 1] - lnk[0]) / (n - 1);
    long i = (long)((x - lnk[0]) / dx);
    if (i > n - 2) i = n - 2;
    const double w = (x - lnk[i]) / dx;
    return lnp[i] * (1.0 - w) + lnp[i + 1] * w;
  };
  const double lo = std::log(1e-6);
  const double hi = std::log(std::min(1e4, 40.0 / std::max(R, 1e-10)));
  double m0 = 0, m1 = 0, m2 = 0;
  const int N = 4096;
  const double h = (hi - lo) / N;
  for (int i = 0; i <= N; ++i) {
    const double lnkk = lo + i * h;
    const double k = std::exp(lnkk);
    const double d2 = k * k * k * std::exp(interp(lnkk)) /
                      (2.0 * M_PI * M_PI);
    const double x = k * R * k * R;
    const double w = std::exp(-x);
    const double simp = (i == 0 || i == N) ? 1.0 : (i % 2 ? 4.0 : 2.0);
    m0 += simp * d2 * w;
    m1 += simp * d2 * (-2.0 * x) * w;
    m2 += simp * d2 * (4.0 * x * x - 4.0 * x) * w;
  }
  m0 *= h / 3.0;
  m1 *= h / 3.0;
  m2 *= h / 3.0;
  out[0] = m0;
  out[1] = m1 / m0;
  out[2] = m2 / m0 - (m1 / m0) * (m1 / m0);
}

// ---------------------------------------------------------------------
// sigma(R) of an un-normalised EH98 spectrum k^n_s T^2 with a top-hat
// window (for the sigma8 normalisation).
// ---------------------------------------------------------------------
double sigma_tophat_eh98(double omega_c, double omega_b, double h,
                         double t_cmb, double n_s, double R) {
  const int N = 8192;
  const double lo = std::log(1e-6), hi = std::log(1e3);
  const double step = (hi - lo) / N;
  std::vector<double> k(N + 1), T(N + 1);
  for (int i = 0; i <= N; ++i) k[i] = std::exp(lo + i * step);
  eh98_transfer(omega_c, omega_b, h, t_cmb, k.data(), T.data(), N + 1);
  double acc = 0.0;
  for (int i = 0; i <= N; ++i) {
    const double x = k[i] * R;
    double w;
    if (x < 1e-4) {
      w = 1.0 - x * x / 10.0;
    } else {
      w = 3.0 * (std::sin(x) - x * std::cos(x)) / (x * x * x);
    }
    const double p = std::pow(k[i], n_s) * T[i] * T[i];
    const double integ = k[i] * k[i] * k[i] * p * w * w;
    const double simp = (i == 0 || i == N) ? 1.0 : (i % 2 ? 4.0 : 2.0);
    acc += simp * integ;
  }
  acc *= step / 3.0;
  return std::sqrt(acc / (2.0 * M_PI * M_PI));
}

}  // extern "C"
