"""Optional compiled kernel for the Dykstra sweep loop.

The hierarchy projection (functions/hierarchy.py:dykstra_matrix) is
~95% of the linking stage's Python CPU, and its cost is numpy CALL
OVERHEAD, not flops: 200 sweeps x ~8 color groups x ~10 small-array
ops on (|group|, 2048) chunks is ~10^4 interpreter round trips per
chunk. This module compiles the sweep loop to a ~30-line C kernel at
first use (gcc is ubiquitous on cluster images; any failure falls
back to the numpy path silently).

BIT-IDENTITY CONTRACT: the kernel performs the exact same IEEE-754
double operations in the exact same order as the numpy path —
  xp = X[par] + corr_p;  xc = X[chi] + corr_c;  m = 0.5 * (xp + xc)
  new = violated ? m : old;  corr = old_plus_corr - new
with edges processed in color-group order (within a group edges are
vertex-disjoint, so numpy's simultaneous update equals sequential
update). `-ffp-contract=off` forbids FMA contraction, which would
otherwise change results at the ulp level. tests/test_hierarchy_qp.py
asserts bitwise equality between the two paths.

Worker-side lifecycle: each executor Python worker compiles once into
a content-addressed /tmp cache (atomic rename — concurrent workers
race benignly); a long-lived cluster amortizes this to zero.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_SRC = r"""
#include <stddef.h>

/* One Dykstra pass over `n_iter` sweeps on a label-major chunk.
   XT: (n_labels, cols) row-major doubles, updated in place.
   corr_p/corr_c: (n_edges, cols) correction buffers, zero on entry.
   par/chi: per-edge label row indices, already in color-group order.
   Exact fixed-point early exit mirrors the numpy path: a sweep with
   no violation AND all-zero entering corrections is a no-op forever. */
void dykstra_sweeps(double *XT,
                    double *corr_p,
                    double *corr_c,
                    const long long *par,
                    const long long *chi,
                    long long n_edges,
                    long long cols,
                    long long n_iter)
{
    int corr_zero = 1;
    for (long long it = 0; it < n_iter; it++) {
        long long any_viol = 0;
        for (long long e = 0; e < n_edges; e++) {
            /* par[e] != chi[e] (no self-loop edges) and the corr
               buffers are distinct allocations, so the four streams
               never alias within one edge's inner loop */
            double *restrict xp_row = XT + par[e] * cols;
            double *restrict xc_row = XT + chi[e] * cols;
            double *restrict cp = corr_p + e * cols;
            double *restrict cc = corr_c + e * cols;
            long long viol_cnt = 0;
            for (long long j = 0; j < cols; j++) {
                double xp = xp_row[j] + cp[j];
                double xc = xc_row[j] + cc[j];
                double m = 0.5 * (xp + xc);
                long long viol = xp < xc;
                double np_ = viol ? m : xp;
                double nc_ = viol ? m : xc;
                viol_cnt += viol;
                cp[j] = xp - np_;
                cc[j] = xc - nc_;
                xp_row[j] = np_;
                xc_row[j] = nc_;
            }
            any_viol += viol_cnt;
        }
        if (!any_viol) {
            if (corr_zero)
                break;
            corr_zero = 1;
        } else {
            corr_zero = 0;
        }
    }
}
"""

_lib = None
_tried = False


def get_kernel():
    """Compiled kernel handle, or None (numpy fallback). Cached."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        tag = hashlib.sha256(_SRC.encode()).hexdigest()[:16]
        cache = os.path.join(tempfile.gettempdir(), f"cello_dykstra_{tag}.so")
        if not os.path.exists(cache):
            with tempfile.TemporaryDirectory(
                dir=tempfile.gettempdir()
            ) as td:
                cpath = os.path.join(td, "dykstra.c")
                with open(cpath, "w") as f:
                    f.write(_SRC)
                built = os.path.join(td, "dykstra.so")
                subprocess.run(
                    [
                        "gcc",
                        "-O3",
                        # -march widens to the host's SIMD; contraction
                        # stays OFF so no FMA — vector IEEE add/mul/cmp
                        # are bit-exact equal to scalar, preserving the
                        # numpy parity contract
                        "-march=native",
                        "-ffp-contract=off",
                        "-fPIC",
                        "-shared",
                        cpath,
                        "-o",
                        built,
                    ],
                    check=True,
                    capture_output=True,
                )
                os.replace(built, cache)  # atomic under concurrent workers
        lib = ctypes.CDLL(cache)
        ll = ctypes.c_longlong
        dp = ctypes.POINTER(ctypes.c_double)
        lp = ctypes.POINTER(ll)
        lib.dykstra_sweeps.argtypes = [dp, dp, dp, lp, lp, ll, ll, ll]
        lib.dykstra_sweeps.restype = None
        _lib = lib
    except Exception:
        _lib = None
    return _lib
