/* End-to-end C consumer of the diffsol_tpu C ABI (role of the reference's
 * diffsol-c integration tests, crates/diffsol-c/tests/logistic_jit.rs):
 * builds DiffSL models through the embedded-Python runtime, solves, and
 * checks against analytic solutions.  Exit code 0 = all checks passed. */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "diffsol_tpu.h"

#define CHECK(cond, msg)                                                   \
    do {                                                                   \
        if (!(cond)) {                                                     \
            fprintf(stderr, "FAIL: %s (%s)\n", msg,                        \
                    diffsol_last_error_message());                         \
            return 1;                                                      \
        }                                                                  \
    } while (0)

static const char *LOGISTIC =
    "in_i { r = 1.0, k = 1.0 }\n"
    "u { 0.1 }\n"
    "F { r * u * (1.0 - u / k) }\n";

static const char *ROBERTSON =
    "in_i { k1 = 0.04, k2 = 10000, k3 = 30000000 }\n"
    "u_i { x = 1, y = 0, z = 0 }\n"
    "dudt_i { dxdt = 1, dydt = 0, dzdt = 0 }\n"
    "M_i { dxdt, dydt, 0 }\n"
    "F_i {\n"
    "    -k1 * x + k2 * y * z,\n"
    "    k1 * x - k2 * y * z - k3 * y * y,\n"
    "    1 - x - y - z,\n"
    "}\n";

int main(void) {
    CHECK(diffsol_init() == 0, "diffsol_init");

    /* ---- logistic: solve_dense vs analytic ---- */
    int64_t ode = diffsol_ode_new_jit(LOGISTIC);
    CHECK(ode > 0, "new_jit(logistic)");
    CHECK(diffsol_ode_set_rtol(ode, 1e-8) == 0, "set_rtol");
    CHECK(diffsol_ode_set_atol(ode, 1e-10) == 0, "set_atol");
    double params[2] = {1.0, 10.0};
    CHECK(diffsol_ode_set_params(ode, params, 2) == 0, "set_params");

    int64_t n = 0;
    CHECK(diffsol_ode_nstates(ode, &n) == 0 && n == 1, "nstates == 1");
    int64_t np = 0;
    CHECK(diffsol_ode_nparams(ode, &np) == 0 && np == 2, "nparams == 2");

    double y0[1];
    CHECK(diffsol_ode_y0(ode, y0, 1) == 0, "y0");
    CHECK(fabs(y0[0] - 0.1) < 1e-12, "y0 == 0.1");

    double f[1];
    CHECK(diffsol_ode_rhs(ode, 0.0, y0, 1, f) == 0, "rhs");
    CHECK(fabs(f[0] - 1.0 * 0.1 * (1.0 - 0.1 / 10.0)) < 1e-12, "rhs value");

    double t_eval[3] = {0.1, 0.25, 0.4};
    double ys[3];
    int stop = -99;
    CHECK(diffsol_ode_solve_dense(ode, t_eval, 3, 2000, ys, &stop) == 0,
          "solve_dense");
    CHECK(stop >= 0, "solve_dense stop_reason ok");
    for (int i = 0; i < 3; ++i) {
        double r = 1.0, k = 10.0, v0 = 0.1, t = t_eval[i];
        double expect = k * v0 * exp(r * t) / (k + v0 * (exp(r * t) - 1.0));
        CHECK(fabs(ys[i] - expect) < 1e-6, "logistic trajectory point");
    }

    /* adaptive solve with every internal step recorded */
    double ts_buf[512], ys_buf[512];
    int64_t npts = 0;
    CHECK(diffsol_ode_solve(ode, 0.4, 500, ts_buf, ys_buf, 512, &npts,
                            &stop) == 0,
          "solve");
    CHECK(npts > 2 && stop >= 0, "solve points recorded");
    CHECK(fabs(ts_buf[npts - 1] - 0.4) < 1e-9, "solve final time");

    /* forward sensitivities: dy/dr and dy/dk at t_eval */
    double sens[2 * 3 * 1];
    double ys2[3];
    CHECK(diffsol_ode_solve_fwd_sens(ode, t_eval, 3, ys2, sens) == 0,
          "solve_fwd_sens");
    /* finite-difference dy/dr cross-check at t = 0.4 */
    double p_hi[2] = {1.0 + 1e-6, 10.0}, p_lo[2] = {1.0 - 1e-6, 10.0};
    double y_hi[3], y_lo[3];
    CHECK(diffsol_ode_set_params(ode, p_hi, 2) == 0, "set_params hi");
    CHECK(diffsol_ode_solve_dense(ode, t_eval, 3, 2000, y_hi, &stop) == 0,
          "solve hi");
    CHECK(diffsol_ode_set_params(ode, p_lo, 2) == 0, "set_params lo");
    CHECK(diffsol_ode_solve_dense(ode, t_eval, 3, 2000, y_lo, &stop) == 0,
          "solve lo");
    double fd = (y_hi[2] - y_lo[2]) / 2e-6;
    CHECK(fabs(sens[0 * 3 + 2] - fd) < 1e-4, "fwd sens dy/dr vs FD");

    /* adjoint gradient of G = sum_i y(t_i): dG/dp vs forward sens */
    CHECK(diffsol_ode_set_params(ode, params, 2) == 0, "set_params adj");
    double dgdu[3] = {1.0, 1.0, 1.0};
    double ys3[3], grad[2];
    CHECK(diffsol_ode_solve_adjoint(ode, t_eval, 3, dgdu, 16384, ys3,
                                    grad) == 0,
          "solve_adjoint");
    double g_fwd_r = sens[0 * 3 + 0] + sens[0 * 3 + 1] + sens[0 * 3 + 2];
    double g_fwd_k = sens[1 * 3 + 0] + sens[1 * 3 + 1] + sens[1 * 3 + 2];
    CHECK(fabs(grad[0] - g_fwd_r) < 1e-4, "adjoint dG/dr vs fwd sens");
    CHECK(fabs(grad[1] - g_fwd_k) < 1e-4, "adjoint dG/dk vs fwd sens");
    diffsol_ode_free(ode);

    /* ---- robertson DAE on BDF (mass matrix through M_i) ---- */
    int64_t dae = diffsol_ode_new_jit(ROBERTSON);
    CHECK(dae > 0, "new_jit(robertson)");
    CHECK(diffsol_ode_set_rtol(dae, 1e-6) == 0, "dae rtol");
    CHECK(diffsol_ode_set_atol(dae, 1e-8) == 0, "dae atol");
    CHECK(diffsol_ode_set_ode_solver(dae, 0) == 0, "dae bdf");
    double te[2] = {0.4, 4.0};
    double yd[6];
    CHECK(diffsol_ode_solve_dense(dae, te, 2, 5000, yd, &stop) == 0,
          "dae solve_dense");
    CHECK(stop >= 0, "dae stop ok");
    /* IDA reference values (reference test_models/robertson.rs soln) */
    CHECK(fabs(yd[0] - 0.9851721) < 1e-4, "robertson x(0.4)");
    CHECK(fabs(yd[2] - 0.0147940) < 1e-4, "robertson z(0.4)");
    /* conservation: x + y + z == 1 */
    CHECK(fabs(yd[3] + yd[4] + yd[5] - 1.0) < 1e-8, "dae conservation");
    /* klu is a CPU/SuiteSparse tier; must be rejected on a live handle */
    CHECK(diffsol_ode_set_linear_solver(dae, 2) == -1, "klu rejected");
    diffsol_clear_last_error();

    /* f32 scalar tier (reference scalar_type.rs): same solve, f32 device
     * precision -- tolerances must sit above f32 eps (the reference's JIT
     * tests use 1e-6 for F32; the stiff DAE needs a little more slack) */
    CHECK(diffsol_ode_set_rtol(dae, 1e-4) == 0, "f32 rtol");
    CHECK(diffsol_ode_set_atol(dae, 1e-6) == 0, "f32 atol");
    CHECK(diffsol_ode_set_scalar_type(dae, 0) == 0, "set f32");
    int sc = -1;
    CHECK(diffsol_ode_get_scalar_type(dae, &sc) == 0 && sc == 0, "get f32");
    double yf[6];
    CHECK(diffsol_ode_solve_dense(dae, te, 2, 5000, yf, &stop) == 0,
          "f32 dae solve");
    CHECK(stop >= 0, "f32 stop ok");
    CHECK(fabs(yf[0] - yd[0]) < 1e-3, "f32 vs f64 trajectory");
    diffsol_ode_free(dae);

    /* ---- error paths ---- */
    CHECK(diffsol_ode_new_jit("not a model {") == 0, "bad model rejected");
    CHECK(strlen(diffsol_last_error_message()) > 0, "error message set");
    diffsol_clear_last_error();
    CHECK(strlen(diffsol_last_error_message()) == 0, "error cleared");
    double dummy;
    CHECK(diffsol_ode_get_rtol(9999, &dummy) == -1, "bad handle rejected");

    printf("capi: ALL CHECKS PASSED\n");
    diffsol_shutdown();
    return 0;
}
