/* C API for edipack_tpu — the analog of the reference's
 * src/c_bindings/edipack_cbindings.h: lets C/C++/Fortran drivers run the
 * TPU-native solver. Implemented by libedipack_tpu_c.so (embedded CPython;
 * build with `make -C edipack_tpu/capi`).
 *
 * Array conventions follow the reference bindings: the packed bath vector is
 * the same layout as EDIpack's user bath array; Hloc is passed as
 * [Nspin*Norb x Nspin*Norb] row-major (real + imaginary parts); Green's
 * function / self-energy buffers are rank-5 [Nspin,Nspin,Norb,Norb,L]
 * row-major interleaved complex (re,im).
 */
#ifndef EDIPACK_TPU_CAPI_H
#define EDIPACK_TPU_CAPI_H

#ifdef __cplusplus
extern "C" {
#endif

/* lifecycle ---------------------------------------------------------- */
int  edtpu_init(void);                       /* start the runtime (idempotent) */
void edtpu_finalize(void);

int  edtpu_read_input(const char *path);     /* parse inputED-style file      */
int  edtpu_set_option_d(const char *name, double value);
int  edtpu_set_option_i(const char *name, long value);
int  edtpu_set_option_s(const char *name, const char *value);

int  edtpu_get_bath_dimension(void);
int  edtpu_init_solver(double *bath, int nb);          /* fills bath           */
int  edtpu_set_hloc(const double *re, const double *im, int nso);
int  edtpu_solve(const double *bath, int nb);

/* getters ------------------------------------------------------------ */
int  edtpu_get_dens(double *out, int norb);
int  edtpu_get_docc(double *out, int norb);
int  edtpu_get_eimp(double *out4);
int  edtpu_get_evals(double *out, int *n, int nmax);
/* Matsubara self-energy / GF on the default grid: out has
 * 2*Nspin*Nspin*Norb*Norb*L doubles (re,im interleaved, C order) */
int  edtpu_get_sigma_matsubara(double *out, int lmats);
int  edtpu_get_gimp_matsubara(double *out, int lmats);

/* chi2 bath fit: func = Weiss/Delta on Matsubara (same packing), bath is
 * updated in place */
int  edtpu_chi2_fitgf(const double *func, int l, double *bath, int nb,
                      int ispin);

const char *edtpu_last_error(void);

#ifdef __cplusplus
}
#endif
#endif /* EDIPACK_TPU_CAPI_H */
