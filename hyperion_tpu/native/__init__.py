"""Native host kernels: on-demand g++ build + ctypes bindings.

The shared library is compiled from native.cpp the first time it is needed
(cached next to the source; rebuilt when the source is newer). Everything
has a pure-numpy fallback, so a missing compiler only costs speed —
``available()`` reports which path is active.
"""

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, 'native.cpp')
_LIB = os.path.join(_HERE, '_hyperion_native.so')

_lib = None
_tried = False


def _build():
    cmd = ['g++', '-O3', '-march=native', '-shared', '-fPIC', '-std=c++17',
           _SRC, '-o', _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_LIB) or
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB)
    except Exception:
        _lib = None
        return None

    i64 = ctypes.c_int64
    f64 = ctypes.c_double
    p = np.ctypeslib.ndpointer(dtype=np.float64, flags='C_CONTIGUOUS')

    lib.hyp_discretize_sph.restype = None
    lib.hyp_discretize_sph.argtypes = [i64, p, p, p, p, p, p,
                                       i64, p, p, p, p, p, f64, p]
    lib.hyp_integrate_loglog.restype = f64
    lib.hyp_integrate_loglog.argtypes = [i64, p, p]
    lib.hyp_interp_loglog.restype = None
    lib.hyp_interp_loglog.argtypes = [i64, p, p, i64, p, p]
    _lib = lib
    return lib


def available():
    """True when the compiled library is (or can be) loaded."""
    return _load() is not None


def _c(a):
    return np.ascontiguousarray(a, dtype=np.float64)


def discretize_sph(xmin, xmax, ymin, ymax, zmin, zmax,
                   mux, muy, muz, sigma, mass, cull=5.0):
    """Exact Gaussian-kernel SPH mass per cell (ref _discretize_sph.c).

    Falls back to a chunked vectorized numpy/scipy implementation."""
    lib = _load()
    xmin, xmax = _c(xmin), _c(xmax)
    ymin, ymax = _c(ymin), _c(ymax)
    zmin, zmax = _c(zmin), _c(zmax)
    mux, muy, muz = _c(mux), _c(muy), _c(muz)
    sigma, mass = _c(sigma), _c(mass)
    n_cells = len(xmin)
    n_part = len(mux)
    if lib is not None:
        out = np.zeros(n_cells)
        lib.hyp_discretize_sph(n_cells, xmin, xmax, ymin, ymax, zmin, zmax,
                               n_part, mux, muy, muz, sigma, mass,
                               float(cull), out)
        return out
    # numpy fallback: cell-chunked erf products
    from scipy.special import erf
    out = np.zeros(n_cells)
    norm = 1.0 / (np.sqrt(2.0) * sigma)
    chunk = max(1, int(2e7) // max(n_part, 1))
    for s in range(0, n_cells, chunk):
        e = min(s + chunk, n_cells)
        fx = erf((xmax[s:e, None] - mux) * norm) - \
            erf((xmin[s:e, None] - mux) * norm)
        fy = erf((ymax[s:e, None] - muy) * norm) - \
            erf((ymin[s:e, None] - muy) * norm)
        fz = erf((zmax[s:e, None] - muz) * norm) - \
            erf((zmin[s:e, None] - muz) * norm)
        out[s:e] = (np.abs(fx * fy * fz) * 0.125 * mass).sum(axis=1)
    return out


def integrate_loglog_native(x, y):
    """Native piecewise power-law integral; None when the library is
    unavailable (callers keep their numpy path)."""
    lib = _load()
    if lib is None:
        return None
    x, y = _c(x), _c(y)
    return float(lib.hyp_integrate_loglog(len(x), x, y))


def interp_loglog_native(x_t, y_t, xq):
    """Native batched log-log interpolation; None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    x_t, y_t, xq = _c(x_t), _c(y_t), _c(xq)
    out = np.zeros(len(xq))
    lib.hyp_interp_loglog(len(x_t), x_t, y_t, len(xq), xq, out)
    return out
