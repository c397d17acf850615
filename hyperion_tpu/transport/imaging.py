"""Peeloff imaging engine: the final (imaging) Monte-Carlo iteration.

TPU-native re-design of the reference's imaging iteration + peeloff
(ref: src/main/iter_final.f90:60-275, src/images/images_peeled.f90:95-270,
src/images/image_type.f90:408-530): a batch while_loop like the Lucy engine
but with no energy deposition; at every emission and interaction event each
configured viewing direction runs a *batched escape-tau walk* (an inner
while_loop over the whole lane batch) and the attenuated weights scatter-add
into (view, aperture/pixel, frequency, origin) flux cubes with sum-of-squares
uncertainty channels.

Forced first interaction (WR99) folds into the emission refill: the escape
optical depth along the emission ray reweights the packet and the first
interaction depth is drawn from the truncated exponential
(ref: src/main/forced_interaction.f90:23-57).
"""

from dataclasses import dataclass, field
from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.tree_util import register_dataclass

from .gtable import ESCAPED
from .engine import update_optical_constants, sample_emission_nu, \
    sample_scattering_mu, select_dust
from .sampling import searchsorted_small
from .sampling import (isotropic_direction, random_exp, rotate_direction,
                       searchsorted_rows)

ORIG_SOURCE_EMIT = 0
ORIG_DUST_EMIT = 1
ORIG_SOURCE_SCAT = 2
ORIG_DUST_SCAT = 3


@register_dataclass
@dataclass(frozen=True)
class PeelGroup:
    # Observer directions (photon travel direction toward observer)
    view_dir: jnp.ndarray      # (n_view, 3)
    east: jnp.ndarray          # (n_view, 3) image +x axis
    north: jnp.ndarray         # (n_view, 3) image +y axis
    origin: jnp.ndarray        # (3,) peeloff origin
    xmin: jnp.ndarray
    xmax: jnp.ndarray
    ymin: jnp.ndarray
    ymax: jnp.ndarray
    log10_nu_min: jnp.ndarray
    log10_nu_max: jnp.ndarray
    log10_ap_min: jnp.ndarray
    log10_ap_max: jnp.ndarray
    n_view: int = field(metadata=dict(static=True))
    n_x: int = field(metadata=dict(static=True))
    n_y: int = field(metadata=dict(static=True))
    n_nu: int = field(metadata=dict(static=True))
    n_ap: int = field(metadata=dict(static=True))
    n_orig: int = field(metadata=dict(static=True))
    compute_image: bool = field(metadata=dict(static=True))
    compute_sed: bool = field(metadata=dict(static=True))
    uncertainties: bool = field(metadata=dict(static=True))
    track_origin: str = field(metadata=dict(static=True))
    # Monochromatic mode: frequency bins are *indices* into the model's
    # exact-frequency list (ref image_type.f90 monochromatic binning)
    monochromatic: bool = field(default=False, metadata=dict(static=True))
    iwav_min: int = field(default=0, metadata=dict(static=True))
    # Stokes channels: 4 (I,Q,U,V) when the conf requests polarization
    # (ref image_type.f90 n_stokes; set_stokes conf_files.py:1149)
    n_stokes: int = field(default=1, metadata=dict(static=True))
    # Inside observer (ref images_peeled.f90:176-213): origin is the observer
    # position; peel directions are per-photon toward the observer; images are
    # (longitude, latitude) sky maps in degrees with 1/(4 pi d^2) dilution
    inside: bool = field(default=False, metadata=dict(static=True))
    # Skip the escape optical depth entirely (ref images_peeled.f90:217-223)
    ignore_optical_depth: bool = field(default=False, metadata=dict(static=True))
    # Convolved filter imaging: each of the n_nu channels is one filter; a
    # photon lands in every filter with weight = tn(nu) (ref
    # image_type.f90:467-470). filter_tn is resampled onto a uniform log10-nu
    # grid at build time so the device-side lookup is a single gather.
    use_filters: bool = field(default=False, metadata=dict(static=True))
    # 'detailed'/'scatterings' origin bookkeeping (ref image_type.f90:228-241)
    track_n_scat: int = field(default=0, metadata=dict(static=True))
    n_sources: int = field(default=1, metadata=dict(static=True))
    n_dust: int = field(default=1, metadata=dict(static=True))
    # Depth cuts select which events enter the image (ref images_peeled:167);
    # None disables the cut
    d_min: jnp.ndarray = None
    d_max: jnp.ndarray = None
    filter_lognu: jnp.ndarray = None   # (n_samp,)
    filter_tn: jnp.ndarray = None      # (n_nu, n_samp)
    # 1/L^2 so the inside-observer 1/(4 pi d^2) dilution is in physical cm
    inv_area: jnp.ndarray = None


def _viewing_frames(angles):
    """(theta, phi) degrees -> (view, east, north) unit-vector triplets.
    view is the photon travel direction toward the observer; (east, north)
    span the image plane. For inside observers these same rows are the sky
    rotation matrix R = [r_hat; phi_hat; -theta_hat]."""
    theta = np.radians([a[0] for a in angles])
    phi = np.radians([a[1] for a in angles])
    st, ct = np.sin(theta), np.cos(theta)
    sp, cp = np.sin(phi), np.cos(phi)
    view = np.stack([st * cp, st * sp, ct], axis=1)
    east = np.stack([-sp, cp, np.zeros_like(sp)], axis=1)
    north = np.stack([-ct * cp, -ct * sp, st], axis=1)
    return view, east, north


def _n_orig(track, track_n_scat, n_sources, n_dust):
    """Number of origin slices per track mode (ref image_type.f90:228-241)."""
    if track == 'no':
        return 1
    if track == 'basic':
        return 4
    if track == 'detailed':
        return 2 * (n_sources + n_dust)
    if track == 'scatterings':
        return 2 * (track_n_scat + 2)
    raise ValueError("unknown track_origin flag: %s" % track)


def _resample_filters(filters, n_samp=512):
    """Resample every filter's normalized response tn onto one shared uniform
    log10(nu) grid (linear interpolation in nu, zero outside each filter's
    support) so the engine-side per-photon lookup is a single gather."""
    lo = min(float(np.min(f.nu)) for f in filters)
    hi = max(float(np.max(f.nu)) for f in filters)
    lognu = np.linspace(np.log10(lo), np.log10(hi), n_samp)
    grid = 10.0 ** lognu
    tn = np.zeros((len(filters), n_samp))
    for i, filt in enumerate(filters):
        fnu, ftn = filt.normalized_response
        tn[i] = np.interp(grid, fnu, ftn, left=0.0, right=0.0)
    return lognu, tn


def build_peel_group(conf, dtype=jnp.float32, length_scale=1.0,
                     n_sources=1, n_dust=1):
    """Build a PeelGroup from a PeeledImageConf."""
    from ..util.constants import c
    L = float(length_scale)
    inside = conf.inside_observer is not None
    if inside:
        angles = conf.viewing_angles or [(90.0, 0.0)]
        origin = np.asarray(conf.inside_observer, float) / L
    else:
        angles = conf.viewing_angles
        origin = np.asarray(conf.peeloff_origin or (0.0, 0.0, 0.0), float) / L
    view, east, north = _viewing_frames(angles)

    filters = getattr(conf, '_filters', None) or []
    filter_lognu = filter_tn = None
    if conf._monochromatic:
        n_nu = conf.iwav_max - conf.iwav_min + 1
        nu_min, nu_max = 1.0, 10.0  # unused: bins are frequency indices
    elif filters:
        n_nu = len(filters)
        nu_min, nu_max = 1.0, 10.0  # unused: bins are filter channels
        filter_lognu, filter_tn = _resample_filters(filters)
    else:
        nu_min = c / (conf.wav_max * 1.e-4)
        nu_max = c / (conf.wav_min * 1.e-4)
        n_nu = conf.n_wav

    if conf.sed:
        ap_min, ap_max = conf.ap_min / L, conf.ap_max / L
        n_ap = conf.n_ap
    else:
        ap_min = ap_max = np.inf
        n_ap = 1

    track = conf.track_origin
    track_n_scat = int(conf.track_n_scat or 0)
    n_orig = _n_orig(track, track_n_scat, n_sources, n_dust)

    d_min = getattr(conf, 'd_min', None)
    d_max = getattr(conf, 'd_max', None)

    f = lambda v: jnp.asarray(v, dtype=dtype)
    # image limits: degrees (lon/lat) for inside observers, cm/L otherwise
    lim = (lambda v: f(v)) if inside else (lambda v: f(v / L))
    return PeelGroup(
        view_dir=f(view), east=f(east), north=f(north), origin=f(origin),
        xmin=lim(conf.xmin) if conf.image else f(0.0),
        xmax=lim(conf.xmax) if conf.image else f(0.0),
        ymin=lim(conf.ymin) if conf.image else f(0.0),
        ymax=lim(conf.ymax) if conf.image else f(0.0),
        log10_nu_min=f(np.log10(nu_min)), log10_nu_max=f(np.log10(nu_max)),
        log10_ap_min=f(np.log10(ap_min) if np.isfinite(ap_min) else 300.0),
        log10_ap_max=f(np.log10(ap_max) if np.isfinite(ap_max) else 300.0),
        n_view=len(angles),
        n_x=conf.n_x if conf.image else 1,
        n_y=conf.n_y if conf.image else 1,
        n_nu=n_nu, n_ap=n_ap, n_orig=n_orig,
        compute_image=bool(conf.image), compute_sed=bool(conf.sed),
        uncertainties=bool(conf.uncertainties), track_origin=track,
        monochromatic=bool(conf._monochromatic),
        iwav_min=int(conf.iwav_min or 0) if conf._monochromatic else 0,
        n_stokes=4 if conf.stokes else 1,
        inside=inside,
        ignore_optical_depth=bool(getattr(conf, 'ignore_optical_depth',
                                          False)),
        use_filters=bool(filters),
        track_n_scat=track_n_scat, n_sources=n_sources, n_dust=n_dust,
        d_min=None if d_min is None else f(d_min / L),
        d_max=None if d_max is None else f(d_max / L),
        filter_lognu=None if filter_lognu is None else f(filter_lognu),
        filter_tn=None if filter_tn is None else f(filter_tn),
        inv_area=f(1.0 / L ** 2) if inside else None)


def build_binned_group(conf, dtype=jnp.float32, length_scale=1.0,
                       n_sources=1, n_dust=1):
    """Build a PeelGroup-shaped spec for binned images: n_view =
    n_theta * n_phi direction bins (ref: images_binned.f90:57-95). The view
    direction arrays are unused — image axes are derived per photon from its
    own exit direction."""
    from ..util.constants import c
    L = float(length_scale)
    filters = getattr(conf, '_filters', None) or []
    filter_lognu = filter_tn = None
    if filters:
        n_nu = len(filters)
        nu_min, nu_max = 1.0, 10.0
        filter_lognu, filter_tn = _resample_filters(filters)
    else:
        nu_min = c / (conf.wav_max * 1.e-4)
        nu_max = c / (conf.wav_min * 1.e-4)
        n_nu = conf.n_wav
    if conf.sed:
        ap_min, ap_max = conf.ap_min / L, conf.ap_max / L
        n_ap = conf.n_ap
    else:
        ap_min = ap_max = np.inf
        n_ap = 1
    track = conf.track_origin
    track_n_scat = int(conf.track_n_scat or 0)
    n_orig = _n_orig(track, track_n_scat, n_sources, n_dust)
    n_view = conf.n_theta * conf.n_phi
    f = lambda v: jnp.asarray(v, dtype=dtype)
    z3 = f(np.zeros((n_view, 3)))
    return PeelGroup(
        view_dir=z3, east=z3, north=z3, origin=f(np.zeros(3)),
        xmin=f(conf.xmin / L if conf.image else 0.0),
        xmax=f(conf.xmax / L if conf.image else 0.0),
        ymin=f(conf.ymin / L if conf.image else 0.0),
        ymax=f(conf.ymax / L if conf.image else 0.0),
        log10_nu_min=f(np.log10(nu_min)), log10_nu_max=f(np.log10(nu_max)),
        log10_ap_min=f(np.log10(ap_min) if np.isfinite(ap_min) else 300.0),
        log10_ap_max=f(np.log10(ap_max) if np.isfinite(ap_max) else 300.0),
        n_view=n_view, n_x=conf.n_x if conf.image else 1,
        n_y=conf.n_y if conf.image else 1,
        n_nu=n_nu, n_ap=n_ap, n_orig=n_orig,
        compute_image=bool(conf.image), compute_sed=bool(conf.sed),
        uncertainties=bool(conf.uncertainties), track_origin=track,
        n_stokes=4 if conf.stokes else 1,
        use_filters=bool(filters),
        track_n_scat=track_n_scat, n_sources=n_sources, n_dust=n_dust,
        filter_lognu=None if filter_lognu is None else f(filter_lognu),
        filter_tn=None if filter_tn is None else f(filter_tn))


class Provenance(NamedTuple):
    """Photon origin bookkeeping at a peel/bin event (the inputs the four
    track_origin modes need; ref orig() image_type.f90:117-134 and the
    detailed/scatterings io expansion :443-461)."""
    scattered: jnp.ndarray    # this event is (or the photon last was) a scatter
    reprocessed: jnp.ndarray  # photon was (re-)emitted by dust
    source_id: jnp.ndarray    # emitting source row
    dust_id: jnp.ndarray      # last interacting dust population
    n_scat: jnp.ndarray       # scatterings since emission


def basic_provenance(orig_idx, like):
    """Build a Provenance from a basic 0-3 origin index (for callers that do
    not track per-id provenance, e.g. the monochromatic iteration)."""
    zi = jnp.zeros_like(like, dtype=jnp.int32)
    orig_idx = jnp.broadcast_to(jnp.asarray(orig_idx, jnp.int32), zi.shape)
    scattered = (orig_idx == ORIG_SOURCE_SCAT) | (orig_idx == ORIG_DUST_SCAT)
    reproc = (orig_idx == ORIG_DUST_EMIT) | (orig_idx == ORIG_DUST_SCAT)
    return Provenance(scattered=scattered, reprocessed=reproc,
                      source_id=zi, dust_id=zi,
                      n_scat=scattered.astype(jnp.int32))


def origin_index(group, prov):
    """Per-lane origin slice (0-based) for this group's track mode."""
    mode = group.track_origin
    if mode == 'no':
        return jnp.zeros_like(prov.source_id)
    if mode == 'basic':
        return jnp.where(
            prov.scattered,
            jnp.where(prov.reprocessed, ORIG_DUST_SCAT, ORIG_SOURCE_SCAT),
            jnp.where(prov.reprocessed, ORIG_DUST_EMIT, ORIG_SOURCE_EMIT))
    if mode == 'detailed':
        # slices: [sources emit][dusts emit][sources scat][dusts scat]
        ns, nd = group.n_sources, group.n_dust
        base = jnp.where(prov.scattered, ns + nd, 0)
        return base + jnp.where(prov.reprocessed, ns + prov.dust_id,
                                prov.source_id)
    if mode == 'scatterings':
        # slices 0..K = exactly n scatterings, K+1 = more, doubled for
        # reprocessed flux (ref image_type.f90:451-461)
        cap = group.track_n_scat + 1
        io = jnp.minimum(prov.n_scat, cap)
        return io + jnp.where(prov.reprocessed, cap + 1, 0)
    raise ValueError("unknown track_origin flag: %s" % mode)


def filter_transmissions(group, nu):
    """(B, n_filt) filter responses at each lane's frequency: linear
    interpolation on the shared log10-nu resampled grid, zero outside."""
    grid = group.filter_lognu
    n_samp = grid.shape[0]
    lognu = jnp.log10(nu)
    j = jnp.clip(searchsorted_small(grid, lognu, side='left'), 1,
                 n_samp - 1)
    w = (lognu - grid[j - 1]) / (grid[j] - grid[j - 1])
    tr = group.filter_tn[:, j - 1] * (1.0 - w) + group.filter_tn[:, j] * w
    inside = (lognu >= grid[0]) & (lognu <= grid[-1])
    return jnp.where(inside[None, :], tr, 0.0).T


def _deposit(group, cube, cube2, cuben, spatial_idx, ok_base, inu, nu_ok, tr,
             io, flux_s):
    """Scatter-add fluxes into a (.., n_nu, n_orig, n_stokes)-flattened cube.

    With ``tr`` (B, n_filt) the lane lands in every filter channel weighted by
    its transmission; otherwise in its single ``inu`` bin. Returns the three
    updated (cube, cube^2, count) arrays.
    """
    size = cube.size
    flat = cube.reshape(-1)
    flat2 = cube2.reshape(-1)
    flatn = cuben.reshape(-1)
    if tr is None:
        channels = [(inu, ok_base & nu_ok, None)]
    else:
        channels = [(f, ok_base & (tr[:, f] > 0.0), tr[:, f])
                    for f in range(group.n_nu)]
    for inu_c, ok, w_c in channels:
        idx0 = ((spatial_idx * group.n_nu + inu_c) * group.n_orig + io) * \
            group.n_stokes
        for s_ch, fx in enumerate(flux_s):
            v = fx if w_c is None else fx * w_c
            idx = jnp.where(ok, idx0 + s_ch, size)
            val = jnp.where(ok, v, 0.0)
            flat = flat.at[idx].add(val, mode='drop')
            if group.uncertainties:
                flat2 = flat2.at[idx].add(val * val, mode='drop')
                flatn = flatn.at[idx].add(jnp.where(ok, 1.0, 0.0),
                                          mode='drop')
    return (flat.reshape(cube.shape), flat2.reshape(cube.shape),
            flatn.reshape(cube.shape))


def _aperture_bin(group, x_img, y_img, cell_like, ok_base):
    """Log-radius aperture bin for SEDs (ref find_sed_bin); photons inside
    ap_min go to bin 0, bins are cumulated at write time."""
    r_img = jnp.sqrt(x_img ** 2 + y_img ** 2)
    logr = jnp.log10(jnp.maximum(r_img, 1e-300))
    if group.n_ap == 1:
        return jnp.zeros_like(cell_like), jnp.ones_like(ok_base)
    fr = (logr - group.log10_ap_min) / \
         (group.log10_ap_max - group.log10_ap_min)
    ir = jnp.floor(fr * (group.n_ap - 1)).astype(jnp.int32) + 1
    ir = jnp.where(logr < group.log10_ap_min, 0, ir)
    ap_ok = ir < group.n_ap
    return jnp.clip(ir, 0, group.n_ap - 1), ap_ok


def _spectral_bin(group, nu, inu_global, shape):
    """(inu, nu_ok, tr) channel info for one lane batch."""
    if group.use_filters:
        return None, jnp.ones(shape, dtype=bool), filter_transmissions(group,
                                                                       nu)
    if group.monochromatic:
        inu = jnp.broadcast_to(
            jnp.asarray(inu_global, jnp.int32) - group.iwav_min, shape)
    else:
        lognu = jnp.log10(nu)
        fnu = (lognu - group.log10_nu_min) / (group.log10_nu_max -
                                              group.log10_nu_min)
        inu = jnp.floor(fnu * group.n_nu).astype(jnp.int32)
    nu_ok = (inu >= 0) & (inu < group.n_nu)
    return jnp.clip(inu, 0, group.n_nu - 1), nu_ok, None


def bin_escaped(group, n_theta, n_phi, acc, x, y, z, kx, ky, kz, nu, energy,
                prov, escaped_mask, dtype, stokes_in=None):
    """Bin escaping photons by their exit direction into the theta/phi
    view cube (ref binned_images_bin_photon, images_binned.f90:57-95)."""
    if stokes_in is None:
        zq = jnp.zeros_like(x)
        stokes_in = (zq, zq, zq)
    stokes_mults = [jnp.ones_like(x)] + list(stokes_in)
    theta = jnp.arccos(jnp.clip(kz, -1.0, 1.0))
    phi = jnp.arctan2(ky, kx) % (2.0 * jnp.pi)
    it = jnp.clip((theta / jnp.pi * n_theta).astype(jnp.int32), 0, n_theta - 1)
    ip = jnp.clip((phi / (2.0 * jnp.pi) * n_phi).astype(jnp.int32), 0,
                  n_phi - 1)
    iv = it * n_phi + ip

    # image plane perpendicular to the photon's own direction
    st_ = jnp.sqrt(jnp.maximum(kx * kx + ky * ky, 1e-30))
    sp, cp = ky / st_, kx / st_
    ct = jnp.clip(kz, -1.0, 1.0)
    x_img = y * cp - x * sp
    y_img = z * st_ - y * ct * sp - x * ct * cp

    inu, nu_ok, tr = _spectral_bin(group, nu, None, x.shape)
    io = jnp.clip(origin_index(group, prov), 0, group.n_orig - 1)
    ok_base = escaped_mask & (energy > 0.0)
    flux_s = [energy * m for m in stokes_mults[:group.n_stokes]]

    sed, sed2, sedn = acc.sed, acc.sed2, acc.sedn
    img, img2, imgn = acc.img, acc.img2, acc.imgn
    if group.compute_sed:
        ir, ap_ok = _aperture_bin(group, x_img, y_img, iv, ok_base)
        sed, sed2, sedn = _deposit(group, sed, sed2, sedn,
                                   iv * group.n_ap + ir, ok_base & ap_ok,
                                   inu, nu_ok, tr, io, flux_s)
    if group.compute_image:
        fx = (x_img - group.xmin) / (group.xmax - group.xmin)
        fy = (y_img - group.ymin) / (group.ymax - group.ymin)
        ix = jnp.floor(fx * group.n_x).astype(jnp.int32)
        iy = jnp.floor(fy * group.n_y).astype(jnp.int32)
        in_img = (ix >= 0) & (ix < group.n_x) & (iy >= 0) & (iy < group.n_y)
        ix = jnp.clip(ix, 0, group.n_x - 1)
        iy = jnp.clip(iy, 0, group.n_y - 1)
        img, img2, imgn = _deposit(group, img, img2, imgn,
                                   (iv * group.n_y + iy) * group.n_x + ix,
                                   ok_base & in_img, inu, nu_ok, tr, io,
                                   flux_s)
    return PeelAccum(sed=sed, sed2=sed2, sedn=sedn, img=img, img2=img2,
                     imgn=imgn)


class PeelAccum(NamedTuple):
    sed: jnp.ndarray    # (n_view, n_ap, n_nu, n_orig)
    sed2: jnp.ndarray
    sedn: jnp.ndarray
    img: jnp.ndarray    # (n_view, n_y, n_x, n_nu, n_orig)
    img2: jnp.ndarray
    imgn: jnp.ndarray


def init_peel_accum(group, dtype):
    g = group
    z = lambda *s: jnp.zeros(s, dtype=dtype)
    return PeelAccum(
        sed=z(g.n_view, g.n_ap, g.n_nu, g.n_orig, g.n_stokes),
        sed2=z(g.n_view, g.n_ap, g.n_nu, g.n_orig, g.n_stokes),
        sedn=z(g.n_view, g.n_ap, g.n_nu, g.n_orig, g.n_stokes),
        img=z(g.n_view, g.n_y, g.n_x, g.n_nu, g.n_orig, g.n_stokes),
        img2=z(g.n_view, g.n_y, g.n_x, g.n_nu, g.n_orig, g.n_stokes),
        imgn=z(g.n_view, g.n_y, g.n_x, g.n_nu, g.n_orig, g.n_stokes))


def escape_tau_walk(geometry, density, chi_rows, x, y, z, kx, ky, kz, cell,
                    active, max_steps=100000, t_max=None):
    """Batched optical depth to grid escape along fixed rays
    (ref: grid_escape_tau, src/grid/grid_propagate_3d.f90:377-480).

    chi_rows: (B, n_dust) cached extinction at each lane's frequency.
    t_max: optional (B,) distance limit — integration stops there instead of
    at the grid edge (inside observers, ref images_peeled.f90:158-161).
    Runs until every active lane has escaped; inactive lanes cost nothing
    extra because the loop condition is over the whole batch.
    """
    limited = t_max is not None

    def cond2(c):
        return jnp.any(c['active']) & (c['i'] < max_steps)

    def body2(c):
        cell_safe = jnp.where(c['cell'] >= 0, c['cell'], 0)
        t_wall, next_cell, ax, wall_coord = geometry.find_wall(
            cell_safe, c['x'], c['y'], c['z'], kx, ky, kz)
        rho_rows = density[:, cell_safe].T
        chi_rho = jnp.sum(chi_rows * rho_rows, axis=-1)
        if limited:
            seg = jnp.minimum(t_wall, c['remaining'])
            remaining = c['remaining'] - t_wall
        else:
            seg = t_wall
            remaining = c['remaining']
        tau = c['tau'] + jnp.where(c['active'], chi_rho * seg, 0.0)
        x2 = c['x'] + t_wall * kx
        y2 = c['y'] + t_wall * ky
        z2 = c['z'] + t_wall * kz
        x2, y2, z2 = geometry.snap(x2, y2, z2, ax, wall_coord, c['active'])
        cell2 = jnp.where(c['active'], next_cell, c['cell'])
        active2 = c['active'] & (cell2 != ESCAPED)
        if limited:
            active2 = active2 & (remaining > 0.0)
        return dict(x=jnp.where(c['active'], x2, c['x']),
                    y=jnp.where(c['active'], y2, c['y']),
                    z=jnp.where(c['active'], z2, c['z']),
                    cell=cell2, tau=tau, active=active2,
                    remaining=remaining, i=c['i'] + 1)

    init = dict(x=x, y=y, z=z, cell=cell,
                tau=jnp.zeros_like(x), active=active,
                remaining=t_max if limited else jnp.zeros_like(x),
                i=jnp.asarray(0, dtype=jnp.int32))
    out = jax.lax.while_loop(cond2, body2, init)
    return out['tau']


def eval_phase_peel(dt, dust_id, nu, mu):
    """Evaluate the normalized phase function P1_peel(mu; nu) per lane
    (nearest frequency bin, linear interpolation in mu — matching the
    scattering sampler's frequency treatment)."""
    n_nu = dt.nu.shape[1]
    n_mu = dt.mu.shape[1]
    inu = jnp.clip(searchsorted_rows(dt.nu, dust_id, nu) - 1, 0, n_nu - 1)
    rows = dust_id * n_nu + inu
    j = jnp.clip(searchsorted_rows(dt.mu, dust_id, mu), 1, n_mu - 1)
    flat = dt.P1_peel.reshape(-1)
    base = rows.astype(jnp.int32) * n_mu
    muflat = dt.mu.reshape(-1)
    mubase = dust_id.astype(jnp.int32) * n_mu
    m0 = muflat[mubase + j - 1]
    m1 = muflat[mubase + j]
    p0 = flat[base + j - 1]
    p1 = flat[base + j]
    frac = jnp.clip(jnp.where(m1 > m0, (mu - m0) / (m1 - m0), 0.0), 0.0, 1.0)
    return p0 + frac * (p1 - p0)


def peel_and_bin(geometry, dt, density, groups, accums, p_x, p_y, p_z,
                 chi_rows, cell, nu, energy, weight_iso, is_scatter, dust_id,
                 k_in_x, k_in_y, k_in_z, prov, active, dtype,
                 inu_global=None, stokes_in=None, surface=None):
    """For every group and view: compute peel weight, escape tau, and bin.

    weight_iso: weight for isotropic events (1); scattering events use the
    scattering matrix at the angle between the incoming direction and the
    view — the full Stokes 4-vector when the group tracks polarization.
    prov: Provenance of the lanes at this event (drives origin slicing).
    surface: optional (mask, nx, ny, nz, limb) — lanes emitted from a
    stellar surface peel with the cosine law 4*mu (or the limb-darkened
    2*(1.5 mu^2 + mu)) instead of weight_iso
    (ref emit_from_sphere_peeloff, source_type.f90:692-707).
    inu_global: in monochromatic mode, the exact-frequency index of every
    lane (scalar or (B,)); frequency bins are indices, not log bins.
    stokes_in: (q, u, v) of the photons (None -> unpolarized).
    """
    from .stokes import peel_scatter_stokes
    if stokes_in is None:
        zq = jnp.zeros_like(p_x)
        stokes_in = (zq, zq, zq)
    q_in, u_in, v_in = stokes_in
    want_stokes = any(g.n_stokes > 1 for g in groups)
    new_accums = []
    for group, acc in zip(groups, accums):
        sed, sed2, sedn = acc.sed, acc.sed2, acc.sedn
        img, img2, imgn = acc.img, acc.img2, acc.imgn
        io = jnp.clip(origin_index(group, prov), 0, group.n_orig - 1)
        inu, nu_ok, tr = _spectral_bin(group, nu, inu_global, cell.shape)
        for iv in range(group.n_view):
            if group.inside:
                # per-photon peel direction toward the observer; escape tau
                # limited to the observer distance; 1/(4 pi d^2) dilution
                # (ref a_peeloff:409-420, images_peeled.f90:158-161,235)
                ddx = group.origin[0] - p_x
                ddy = group.origin[1] - p_y
                ddz = group.origin[2] - p_z
                d_obs = jnp.sqrt(ddx ** 2 + ddy ** 2 + ddz ** 2)
                d_safe = jnp.maximum(d_obs, 1e-30)
                vdx, vdy, vdz = ddx / d_safe, ddy / d_safe, ddz / d_safe
                t_max = d_obs
                depth = d_obs
            else:
                vd = group.view_dir[iv]
                vdx = jnp.full_like(p_x, vd[0])
                vdy = jnp.full_like(p_x, vd[1])
                vdz = jnp.full_like(p_x, vd[2])
                t_max = None
                # depth of the event along the line of sight
                # (ref images_peeled.f90:162-167)
                depth = -(vdx * p_x + vdy * p_y + vdz * p_z)

            # peel probability (Stokes-aware when any group wants it;
            # ref interact_peeloff -> dust_scatter_peeloff)
            if want_stokes:
                wI, wQ, wU, wV = peel_scatter_stokes(
                    dt, dust_id, nu, k_in_x, k_in_y, k_in_z,
                    q_in, u_in, v_in, vdx, vdy, vdz)
                w = jnp.where(is_scatter, wI, weight_iso)
                w_q = jnp.where(is_scatter, wQ, 0.0)
                w_u = jnp.where(is_scatter, wU, 0.0)
                w_v = jnp.where(is_scatter, wV, 0.0)
            else:
                mu_req = k_in_x * vdx + k_in_y * vdy + k_in_z * vdz
                w_scat = eval_phase_peel(dt, dust_id, nu, mu_req)
                w = jnp.where(is_scatter, w_scat, weight_iso)
                w_q = w_u = w_v = None

            if surface is not None:
                s_mask, snx, sny, snz, limb = surface
                mu_s = jnp.maximum(snx * vdx + sny * vdy + snz * vdz, 0.0)
                w_surf = jnp.where(limb, 2.0 * (1.5 * mu_s * mu_s + mu_s),
                                   4.0 * mu_s)
                w = jnp.where(s_mask & ~is_scatter, w_surf, w)

            if group.ignore_optical_depth:
                tau = jnp.zeros_like(p_x)
            else:
                tau = escape_tau_walk(geometry, density, chi_rows,
                                      p_x, p_y, p_z, vdx, vdy, vdz,
                                      cell, active, t_max=t_max)
            atten = energy * jnp.exp(-tau)
            if group.inside:
                dil = group.inv_area / \
                    (4.0 * jnp.pi * jnp.maximum(d_obs, 1e-30) ** 2)
                atten = atten * dil
            flux = w * atten
            if group.n_stokes > 1:
                flux_s = [flux, w_q * atten, w_u * atten, w_v * atten]
            else:
                flux_s = [flux]

            # image-plane coordinates
            if group.inside:
                # sky projection: rotate the (toward-observer-flipped) photon
                # direction into the view frame R=[r_hat; east; north] and
                # take (lon, lat) in degrees with wraparound
                # (ref images_peeled.f90:176-206)
                r_hat, e, n = (group.view_dir[iv], group.east[iv],
                               group.north[iv])
                vax, vay, vaz = vdx, vdy, vdz
                vs_x = vax * r_hat[0] + vay * r_hat[1] + vaz * r_hat[2]
                vs_y = vax * e[0] + vay * e[1] + vaz * e[2]
                vs_z = vax * n[0] + vay * n[1] + vaz * n[2]
                rad2deg = 180.0 / jnp.pi
                x_img = jnp.arctan2(vs_y, vs_x) * rad2deg
                y_img = jnp.arctan2(jnp.sqrt(vs_x ** 2 + vs_y ** 2),
                                    vs_z) * rad2deg - 90.0
                if group.compute_image:
                    x_img = group.xmax + jnp.mod(x_img - group.xmax, 360.0)
                    y_img = group.ymin + jnp.mod(y_img - group.ymin, 360.0)
            else:
                dx = p_x - group.origin[0]
                dy = p_y - group.origin[1]
                dz = p_z - group.origin[2]
                e, n = group.east[iv], group.north[iv]
                x_img = dx * e[0] + dy * e[1] + dz * e[2]
                y_img = dx * n[0] + dy * n[1] + dz * n[2]

            ok_base = active & (flux > 0.0)
            if group.d_min is not None:
                ok_base = ok_base & (depth >= group.d_min)
            if group.d_max is not None:
                ok_base = ok_base & (depth <= group.d_max)
            iv_idx = jnp.full_like(cell, iv)

            if group.compute_sed:
                ir, ap_ok = _aperture_bin(group, x_img, y_img, cell, ok_base)
                sed, sed2, sedn = _deposit(
                    group, sed, sed2, sedn, iv_idx * group.n_ap + ir,
                    ok_base & ap_ok, inu, nu_ok, tr, io, flux_s)

            if group.compute_image:
                fx = (x_img - group.xmin) / (group.xmax - group.xmin)
                fy = (y_img - group.ymin) / (group.ymax - group.ymin)
                ix = jnp.floor(fx * group.n_x).astype(jnp.int32)
                iy = jnp.floor(fy * group.n_y).astype(jnp.int32)
                in_img = (ix >= 0) & (ix < group.n_x) & \
                    (iy >= 0) & (iy < group.n_y)
                ix = jnp.clip(ix, 0, group.n_x - 1)
                iy = jnp.clip(iy, 0, group.n_y - 1)
                img, img2, imgn = _deposit(
                    group, img, img2, imgn,
                    (iv_idx * group.n_y + iy) * group.n_x + ix,
                    ok_base & in_img, inu, nu_ok, tr, io, flux_s)

        new_accums.append(PeelAccum(sed=sed, sed2=sed2, sedn=sedn,
                                    img=img, img2=img2, imgn=imgn))
    return new_accums


class FinalPacketState(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    kx: jnp.ndarray
    ky: jnp.ndarray
    kz: jnp.ndarray
    nu: jnp.ndarray
    energy: jnp.ndarray
    cell: jnp.ndarray
    tau: jnp.ndarray
    n_inter: jnp.ndarray
    n_mrw: jnp.ndarray
    n_reabs: jnp.ndarray       # successive source re-absorption count
    reemit_src: jnp.ndarray    # source row to re-emit from (-1 = none)
    alive: jnp.ndarray
    reprocessed: jnp.ndarray   # ever re-emitted by dust
    scattered: jnp.ndarray     # scattered since last emission
    source_id: jnp.ndarray     # emitting source row (detailed origin)
    dust_id: jnp.ndarray       # last interacting dust population
    n_scat: jnp.ndarray        # scatterings since source emission
    chi: jnp.ndarray
    kappa: jnp.ndarray
    albedo: jnp.ndarray
    # Stokes Q, U, V in the meridian frame of the travel direction
    # (I normalized to 1; ref type_photon %s, dust_scatter:566-571)
    q: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray


def make_final_step(geometry, dt, st, density, jnu_var_id, jnu_var_frac,
                    groups, config, binned=None, se_rho=None, mrw=None):
    """While-loop body for the imaging iteration. ``binned`` optionally is
    (group_spec, n_theta, n_phi) for direction-binned images."""
    dtype = density.dtype
    n_cells = density.shape[1]

    from .stable import emit_packets, nearest_source_intersection

    ffi = config['forced_first_interaction']
    peeloff_scattering_only = config['peeloff_scattering_only']
    reabs_on = bool(config.get('source_intersect', False))
    n_reabs_max = int(config.get('n_reabs_max', 0))

    emit_kw = {}
    if st.has_map:
        emit_kw['geometry'] = geometry
    if st.has_lte:
        emit_kw['lte_ctx'] = (dt, jnu_var_id, jnu_var_frac,
                              se_rho if se_rho is not None
                              else jnp.zeros_like(density))

    def step(carry):
        p = carry['packets']
        key, k_e, k_tau, k_ffi, k_dust, k_coin, k_nu, k_dir, k_mu, k_phi, \
            k_tau2, k_s = jax.random.split(carry['key'], 12)

        # ---- refill + emission peeloff + FFI --------------------------------
        dead = ~p.alive
        if reabs_on:
            pending = p.reemit_src >= 0
            dead = dead & ~pending
        rank = jnp.cumsum(dead.astype(carry['budget'].dtype))
        can_fresh = dead & (rank <= carry['budget'])
        n_new = jnp.sum(can_fresh.astype(carry['budget'].dtype))

        killed_int = carry['killed_int']
        if reabs_on:
            # re-emission from the absorbing source, keeping the photon's
            # energy; FFI never applies to re-emits (ref iter_final.f90:
            # 219-243: emit(reemit=.true.) then plain random_exp)
            u = jax.random.uniform(k_s, p.x.shape, dtype=dtype)
            src_fresh = jnp.clip(
                searchsorted_small(st.lum_cdf, u, side='left'),
                0, st.n_sources - 1).astype(jnp.int32)
            reabs_kill = pending & (p.n_reabs + 1 > n_reabs_max)
            reemit_ok = pending & ~reabs_kill
            src = jnp.where(reemit_ok, p.reemit_src, src_fresh)
            can = can_fresh | reemit_ok
            new = emit_packets(st, k_e, p.x.shape[0], dtype, src=src)
            killed_int = killed_int + jnp.sum(
                reabs_kill.astype(killed_int.dtype))
        else:
            reemit_ok = jnp.zeros_like(can_fresh)
            can = can_fresh
            new = emit_packets(st, k_e, p.x.shape[0], dtype)

        cell_new = geometry.find_cell(new['x'], new['y'], new['z'],
                                      new['kx'], new['ky'], new['kz'])
        chi_n, kappa_n, alb_n = update_optical_constants(dt, new['nu'])

        m = lambda old, new_: jnp.where(can, new_, old)
        m2 = lambda old, new_: jnp.where(can[:, None], new_, old)

        emitted = can & (cell_new != ESCAPED)
        energy_new = jnp.where(reemit_ok, p.energy, new['energy'])

        # Forced first interaction (WR99 or Baes16 composite biasing):
        # reweight the packet and draw the first interaction depth inside
        # the grid (ref iter_final.f90:178-210)
        if ffi:
            from .ffi import sample_first_interaction
            tau_esc = escape_tau_walk(geometry, density, chi_n,
                                      new['x'], new['y'], new['z'],
                                      new['kx'], new['ky'], new['kz'],
                                      cell_new, emitted & ~reemit_ok)
            applies = (tau_esc > 1e-10) & ~reemit_ok
            tau_new, w_ffi = sample_first_interaction(
                k_ffi, tau_esc, applies, config['ffi_algorithm'],
                config['ffi_baes16_xi'], dtype)
            energy_peel = energy_new
            energy_new = energy_new * jnp.where(reemit_ok, 1.0, w_ffi)
        else:
            tau_new = random_exp(k_tau, p.tau.shape, dtype)
            energy_peel = energy_new

        packets = FinalPacketState(
            x=m(p.x, new['x']), y=m(p.y, new['y']), z=m(p.z, new['z']),
            kx=m(p.kx, new['kx']), ky=m(p.ky, new['ky']), kz=m(p.kz, new['kz']),
            nu=m(p.nu, new['nu']),
            energy=m(p.energy, energy_new),
            cell=jnp.where(can, cell_new, p.cell),
            tau=m(p.tau, tau_new),
            n_inter=jnp.where(can_fresh, 0, p.n_inter),
            n_mrw=jnp.where(can, 0, p.n_mrw),
            n_reabs=(jnp.where(can_fresh, 0,
                               jnp.where(reemit_ok, p.n_reabs + 1, p.n_reabs))
                     if reabs_on else p.n_reabs),
            reemit_src=(jnp.where(pending, -1, p.reemit_src)
                        if reabs_on else p.reemit_src),
            alive=p.alive | (emitted & (energy_new > 0.0)),
            reprocessed=jnp.where(can, False, p.reprocessed),
            scattered=jnp.where(can, False, p.scattered),
            source_id=jnp.where(can, new['source'], p.source_id),
            dust_id=jnp.where(can, 0, p.dust_id),
            n_scat=jnp.where(can, 0, p.n_scat),
            chi=m2(p.chi, chi_n), kappa=m2(p.kappa, kappa_n),
            albedo=m2(p.albedo, alb_n),
            q=jnp.where(can, 0.0, p.q), u=jnp.where(can, 0.0, p.u),
            v=jnp.where(can, 0.0, p.v))

        accums = carry['accums']
        # Emission peeloff with the pre-FFI energy (the FFI reweight applies
        # to the *transported* photon only; ref iter_final.f90:120 peels
        # before the forced interaction). Re-emitted photons peel even in
        # scattering-only mode "because this is a kind of scattering"
        # (ref iter_final.f90:225-228).
        peel_emit = (emitted & reemit_ok) if peeloff_scattering_only \
            else emitted
        if (not peeloff_scattering_only) or reabs_on:
            prov_emit = Provenance(
                scattered=jnp.zeros_like(emitted),
                reprocessed=jnp.zeros_like(emitted),
                source_id=packets.source_id,
                dust_id=packets.dust_id,
                n_scat=jnp.zeros_like(packets.n_scat))
            accums = peel_and_bin(
                geometry, dt, density, groups, accums,
                packets.x, packets.y, packets.z, packets.chi, packets.cell,
                packets.nu, jnp.where(peel_emit, energy_peel, 0.0),
                jnp.ones_like(packets.x), jnp.zeros_like(emitted),
                jnp.zeros_like(packets.cell), packets.kx, packets.ky,
                packets.kz, prov_emit, peel_emit, dtype,
                surface=(new['surf'], new['snx'], new['sny'], new['snz'],
                         new['limb']))

        p = packets
        budget = carry['budget'] - n_new
        energy_current = carry['energy_current'] + jnp.sum(
            jnp.where(can_fresh, new['energy'], 0.0)).astype(dtype)

        cell_safe = jnp.where(p.cell >= 0, p.cell, 0)

        # ---- MRW-noenergy (ref iter_final.f90:167-184 + grid_do_mrw_noenergy,
        # grid_mrw_3d.f90:113-150): jump to the closest-wall sphere, resample
        # nu from b_nu, depolarize, peel isotropically ----------------------
        if mrw is not None:
            k_m1, k_m2, k_m3, k_m4 = jax.random.split(
                jax.random.fold_in(key, 23), 4)
            d_close = geometry.closest_wall_distance(cell_safe, p.x, p.y, p.z)
            tau_close = mrw.alpha_inv_planck[cell_safe] * d_close
            mrw_now = p.alive & (p.n_inter >= 1) & (tau_close > mrw.gamma)
            jx, jy, jz = isotropic_direction(k_m1, p.x.shape, dtype)
            nkx_m, nky_m, nkz_m = isotropic_direction(k_m2, p.x.shape, dtype)
            rho_rows_m = density[:, cell_safe].T
            d_sel_m = select_dust(k_m3, p.chi, rho_rows_m)
            nu_m = sample_emission_nu(dt, d_sel_m,
                                      jnu_var_id[d_sel_m, cell_safe],
                                      jnu_var_frac[d_sel_m, cell_safe],
                                      k_m4, use_bnu=True)
            chi_m, kappa_m, alb_m = update_optical_constants(dt, nu_m)
            n_mrw_new = p.n_mrw + mrw_now.astype(jnp.int32)
            killed_mrw = mrw_now & (n_mrw_new > config['n_mrw_max'])
            p = p._replace(
                x=jnp.where(mrw_now, p.x + d_close * jx, p.x),
                y=jnp.where(mrw_now, p.y + d_close * jy, p.y),
                z=jnp.where(mrw_now, p.z + d_close * jz, p.z),
                kx=jnp.where(mrw_now, nkx_m, p.kx),
                ky=jnp.where(mrw_now, nky_m, p.ky),
                kz=jnp.where(mrw_now, nkz_m, p.kz),
                nu=jnp.where(mrw_now, nu_m, p.nu),
                chi=jnp.where(mrw_now[:, None], chi_m, p.chi),
                kappa=jnp.where(mrw_now[:, None], kappa_m, p.kappa),
                albedo=jnp.where(mrw_now[:, None], alb_m, p.albedo),
                q=jnp.where(mrw_now, 0.0, p.q),
                u=jnp.where(mrw_now, 0.0, p.u),
                v=jnp.where(mrw_now, 0.0, p.v),
                dust_id=jnp.where(mrw_now, d_sel_m.astype(jnp.int32),
                                  p.dust_id),
                reprocessed=p.reprocessed | mrw_now,
                n_mrw=n_mrw_new,
                alive=p.alive & ~killed_mrw)
            killed_int = killed_int + jnp.sum(
                killed_mrw.astype(killed_int.dtype))
            # peel at the MRW event: isotropic b_nu re-emission
            # (ref mrw_peeloff is direction-only -> weight 1)
            if not peeloff_scattering_only:
                prov_mrw = Provenance(
                    scattered=jnp.zeros_like(mrw_now),
                    reprocessed=jnp.ones_like(mrw_now),
                    source_id=p.source_id, dust_id=p.dust_id,
                    n_scat=p.n_scat)
                peel_mrw = mrw_now & p.alive
                accums = peel_and_bin(
                    geometry, dt, density, groups, accums,
                    p.x, p.y, p.z, p.chi, p.cell, p.nu,
                    jnp.where(peel_mrw, p.energy, 0.0),
                    jnp.ones_like(p.x), jnp.zeros_like(mrw_now),
                    d_sel_m, p.kx, p.ky, p.kz, prov_mrw, peel_mrw, dtype)
            mrw_skip = mrw_now
        else:
            mrw_skip = jnp.zeros_like(p.alive)

        # ---- propagation substep (no energy deposit) ------------------------
        active = p.alive & ~mrw_skip
        t_wall, next_cell, ax, wall_coord = geometry.find_wall(
            cell_safe, p.x, p.y, p.z, p.kx, p.ky, p.kz)
        rho_rows = density[:, cell_safe].T
        chi_rho = jnp.sum(p.chi * rho_rows, axis=-1)
        tau_wall = chi_rho * t_wall
        hits_wall = (tau_wall < p.tau) | (chi_rho <= 0.0)
        t_int = jnp.where(chi_rho > 0.0, p.tau / jnp.maximum(chi_rho, 1e-300),
                          t_wall)
        d_move = jnp.where(hits_wall, t_wall, t_int)

        # source re-absorption: segment crosses a source surface -> dormant
        # until re-emitted at the next refill (ref grid_integrate_noenergy,
        # grid_propagate_3d.f90:283,327-330)
        if reabs_on:
            t_src, src_row = nearest_source_intersection(
                st, p.x, p.y, p.z, p.kx, p.ky, p.kz)
            hits_src = active & (d_move > t_src)
            hits_wall = hits_wall & ~hits_src
            moving = active & ~hits_src
        else:
            hits_src = jnp.zeros_like(active)
            moving = active

        x = jnp.where(moving, p.x + d_move * p.kx, p.x)
        y = jnp.where(moving, p.y + d_move * p.ky, p.y)
        z = jnp.where(moving, p.z + d_move * p.kz, p.z)
        x, y, z = geometry.snap(x, y, z, ax, wall_coord, moving & hits_wall)
        tau = jnp.where(moving & hits_wall, p.tau - tau_wall,
                        jnp.where(moving, jnp.zeros_like(p.tau), p.tau))

        cell = jnp.where(moving & hits_wall, next_cell, p.cell)
        escaped = moving & hits_wall & (cell == ESCAPED)

        # ---- interaction ----------------------------------------------------
        interacting = moving & ~hits_wall
        d_sel = select_dust(k_dust, p.chi, rho_rows)
        alb = jnp.take_along_axis(p.albedo, d_sel[:, None], axis=-1)[:, 0]
        coin = jax.random.uniform(k_coin, alb.shape, dtype=dtype)
        scatter = coin <= alb

        var_id = jnu_var_id[d_sel, cell_safe]
        var_frac = jnu_var_frac[d_sel, cell_safe]
        nu_em = sample_emission_nu(dt, d_sel, var_id, var_frac, k_nu)
        ex, ey, ez = isotropic_direction(k_dir, p.nu.shape, dtype)
        # polarization-aware scattering (ref dust_scatter w/ Stokes)
        from .stokes import sample_scatter_stokes
        k_st = jax.random.fold_in(k_mu, 7)
        sx, sy, sz, q_s, u_s, v_s = sample_scatter_stokes(
            dt, d_sel, p.nu, k_st, p.kx, p.ky, p.kz, p.q, p.u, p.v)

        absorbed = interacting & ~scatter
        scattered_now = interacting & scatter
        nu = jnp.where(absorbed, nu_em, p.nu)
        kx = jnp.where(absorbed, ex, jnp.where(scattered_now, sx, p.kx))
        ky = jnp.where(absorbed, ey, jnp.where(scattered_now, sy, p.ky))
        kz = jnp.where(absorbed, ez, jnp.where(scattered_now, sz, p.kz))
        # dust re-emission depolarizes; scattering rotates/polarizes
        q_new = jnp.where(absorbed, 0.0, jnp.where(scattered_now, q_s, p.q))
        u_new = jnp.where(absorbed, 0.0, jnp.where(scattered_now, u_s, p.u))
        v_new = jnp.where(absorbed, 0.0, jnp.where(scattered_now, v_s, p.v))

        reprocessed = p.reprocessed | absorbed
        scattered_flag = jnp.where(absorbed, False,
                                   p.scattered | scattered_now)

        # ---- interaction peeloff -------------------------------------------
        # Origin: scattering keeps the last-emission provenance; absorption
        # resets to dust emission (ref orig(), image_type.f90:117-134).
        # n_scat counts scatterings since emission and survives dust
        # re-emission (ref dust_interact.f90:70 — only increments)
        n_scat_now = p.n_scat + scattered_now.astype(jnp.int32)
        dust_id_now = jnp.where(interacting, d_sel.astype(jnp.int32),
                                p.dust_id)
        prov_int = Provenance(
            scattered=scattered_now,
            reprocessed=jnp.where(scattered_now, p.reprocessed, True),
            source_id=p.source_id, dust_id=dust_id_now, n_scat=n_scat_now)
        # refresh opacities for re-emitted lanes BEFORE peeling: the peel
        # escape-tau must use the re-emitted frequency's extinction
        # (ref: interact() calls update_optconsts before peeloff_photon)
        chi_n2, kappa_n2, alb_n2 = update_optical_constants(dt, nu)
        chi = jnp.where(absorbed[:, None], chi_n2, p.chi)
        kappa = jnp.where(absorbed[:, None], kappa_n2, p.kappa)
        albedo = jnp.where(absorbed[:, None], alb_n2, p.albedo)

        # Killed photons do not peel (ref iter_final.f90:262-268)
        peel_events = interacting
        if peeloff_scattering_only:
            peel_events = scattered_now
        if config['kill_on_absorb']:
            peel_events = peel_events & ~absorbed
        if config['kill_on_scatter']:
            peel_events = peel_events & ~scattered_now
        accums = peel_and_bin(
            geometry, dt, density, groups, accums,
            x, y, z, chi, cell, nu, p.energy,
            jnp.ones_like(x), scattered_now, d_sel,
            p.kx, p.ky, p.kz, prov_int, peel_events, dtype,
            stokes_in=(p.q, p.u, p.v))

        tau = jnp.where(interacting, random_exp(k_tau2, tau.shape, dtype), tau)
        n_inter = p.n_inter + interacting.astype(jnp.int32)

        # direction-aware relocation after the direction changed (a packet
        # interacting exactly ON a wall may now point into the other cell;
        # ref adjust_wall — see engine.py for the full rationale)
        cell_re = geometry.find_cell(x, y, z, kx, ky, kz)
        cell = jnp.where(interacting & (cell_re != ESCAPED), cell_re, cell)

        killed_now = interacting & (n_inter > config['n_inter_max'])
        kill_flag = (config['kill_on_scatter'] & scattered_now) | \
                    (config['kill_on_absorb'] & absorbed)
        killed_now = killed_now | (interacting & kill_flag)

        alive = active & ~escaped & ~killed_now & ~hits_src
        if reabs_on:
            reemit_src = jnp.where(hits_src, src_row, p.reemit_src)
            n_reabs = jnp.where(interacting, 0, p.n_reabs)
        else:
            reemit_src = p.reemit_src
            n_reabs = p.n_reabs

        # --- binned images: bin photons that escape the grid ---------------
        binned_acc = carry.get('binned_acc')
        if binned is not None:
            bgroup, n_theta, n_phi = binned
            prov_escape = Provenance(
                scattered=p.scattered, reprocessed=p.reprocessed,
                source_id=p.source_id, dust_id=p.dust_id, n_scat=p.n_scat)
            binned_acc = bin_escaped(bgroup, n_theta, n_phi, binned_acc,
                                     x, y, z, p.kx, p.ky, p.kz, p.nu,
                                     p.energy, prov_escape, escaped, dtype,
                                     stokes_in=(p.q, p.u, p.v))

        packets = FinalPacketState(
            x=x, y=y, z=z, kx=kx, ky=ky, kz=kz, nu=nu, energy=p.energy,
            cell=cell, tau=tau, n_inter=n_inter,
            n_mrw=jnp.where(interacting, 0, p.n_mrw), n_reabs=n_reabs,
            reemit_src=reemit_src, alive=alive,
            reprocessed=reprocessed, scattered=scattered_flag,
            source_id=p.source_id, dust_id=dust_id_now, n_scat=n_scat_now,
            chi=chi, kappa=kappa, albedo=albedo,
            q=q_new, u=u_new, v=v_new)

        return dict(packets=packets, key=key, budget=budget,
                    energy_current=energy_current, accums=accums,
                    binned_acc=binned_acc,
                    killed_int=killed_int +
                    jnp.sum(killed_now.astype(killed_int.dtype)),
                    n_steps=carry['n_steps'] + 1)

    return step


def final_iteration_impl(geometry, dt, st, density, jnu_var_id, jnu_var_frac,
                         groups, key, n_photons, batch_size, config_tuple,
                         binned_group=None, binned_dims=None, se_rho=None,
                         mrw=None):
    """Un-jitted imaging-iteration body (also the per-device function under
    shard_map for multi-chip runs; ref mp_collect_images,
    src/mpi/mpi_routines.f90:363-471 for the reduction that follows)."""
    config = dict(config_tuple)
    n_dust = dt.n_dust
    dtype = density.dtype
    B = batch_size
    itype = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32

    zeros = lambda *s: jnp.zeros(s, dtype=dtype)
    packets = FinalPacketState(
        x=zeros(B), y=zeros(B), z=zeros(B),
        kx=zeros(B), ky=zeros(B), kz=jnp.ones((B,), dtype=dtype),
        nu=jnp.ones((B,), dtype=dtype), energy=zeros(B),
        cell=jnp.zeros((B,), dtype=jnp.int32),
        tau=zeros(B), n_inter=jnp.zeros((B,), dtype=jnp.int32),
        n_mrw=jnp.zeros((B,), dtype=jnp.int32),
        n_reabs=jnp.zeros((B,), dtype=jnp.int32),
        reemit_src=jnp.full((B,), -1, dtype=jnp.int32),
        alive=jnp.zeros((B,), dtype=bool),
        reprocessed=jnp.zeros((B,), dtype=bool),
        scattered=jnp.zeros((B,), dtype=bool),
        source_id=jnp.zeros((B,), dtype=jnp.int32),
        dust_id=jnp.zeros((B,), dtype=jnp.int32),
        n_scat=jnp.zeros((B,), dtype=jnp.int32),
        chi=zeros(B, n_dust), kappa=zeros(B, n_dust),
        albedo=zeros(B, n_dust),
        q=zeros(B), u=zeros(B), v=zeros(B))

    accums = [init_peel_accum(g, dtype) for g in groups]
    binned = None
    binned_acc = None
    if binned_group is not None:
        n_theta, n_phi = binned_dims
        binned = (binned_group, n_theta, n_phi)
        binned_acc = init_peel_accum(binned_group, dtype)
    carry = dict(packets=packets, key=key,
                 budget=jnp.asarray(n_photons, dtype=itype),
                 energy_current=jnp.asarray(0.0, dtype=dtype),
                 accums=accums, binned_acc=binned_acc,
                 killed_int=jnp.asarray(0, dtype=itype),
                 n_steps=jnp.asarray(0, dtype=itype))

    step = make_final_step(geometry, dt, st, density, jnu_var_id,
                           jnu_var_frac, groups, config, binned=binned,
                           se_rho=se_rho, mrw=mrw)
    max_steps = config['max_steps']

    reabs_on = bool(config.get('source_intersect', False))

    def cond(carry):
        live = jnp.any(carry['packets'].alive)
        if reabs_on:
            live = live | jnp.any(carry['packets'].reemit_src >= 0)
        return ((carry['budget'] > 0) | live) & (carry['n_steps'] < max_steps)

    carry = jax.lax.while_loop(cond, step, carry)
    killed_int = carry['killed_int']
    if reabs_on:
        killed_int = killed_int + jnp.sum(
            (carry['packets'].reemit_src >= 0).astype(killed_int.dtype))
    return (carry['accums'], carry['binned_acc'], carry['energy_current'],
            killed_int, carry['n_steps'])


_run_final_jit = partial(jax.jit, static_argnames=('batch_size',
                                                   'config_tuple',
                                                   'binned_dims'))(
    final_iteration_impl)


def run_final(geometry, dt, st, density, specific_energy, groups, key,
              n_photons, batch_size=65536, n_inter_max=1000000,
              kill_on_scatter=False, kill_on_absorb=False,
              forced_first_interaction=True, peeloff_scattering_only=False,
              n_reabs_max=0, max_steps=100000000,
              binned_group=None, binned_dims=None,
              ffi_algorithm='wr99', ffi_baes16_xi=0.5, mesh=None,
              use_mrw=False, mrw_gamma=1.0, n_mrw_max=1000):
    """Run the imaging iteration; returns (accums, energy_current, stats).
    With ``mesh`` the photon batch is data-parallel over the devices and the
    image cubes come back psum-reduced (parallel/mesh.py)."""
    from .lucy import compute_jnu_var
    import jax.numpy as jnp_

    if specific_energy is None:
        specific_energy = jnp_.zeros_like(density)
    jnu_var_id, jnu_var_frac = compute_jnu_var(dt, jnp_.asarray(specific_energy,
                                                                dtype=density.dtype))
    config_tuple = (('n_inter_max', int(n_inter_max)),
                    ('kill_on_scatter', bool(kill_on_scatter)),
                    ('kill_on_absorb', bool(kill_on_absorb)),
                    ('forced_first_interaction', bool(forced_first_interaction)),
                    ('peeloff_scattering_only', bool(peeloff_scattering_only)),
                    ('ffi_algorithm', str(ffi_algorithm)),
                    ('ffi_baes16_xi', float(ffi_baes16_xi)),
                    ('n_reabs_max', int(n_reabs_max)),
                    ('source_intersect', bool(st.any_intersect)),
                    ('n_mrw_max', int(n_mrw_max)),
                    ('max_steps', int(max_steps)))
    mrw_tables = None
    if use_mrw:
        from .mrw import prepare_mrw_tables
        mrw_tables = prepare_mrw_tables(
            dt, density, jnp_.asarray(specific_energy, dtype=density.dtype),
            mrw_gamma, density.dtype)
    se_rho = (jnp_.asarray(specific_energy, dtype=density.dtype) * density
              if st.has_lte else None)
    if mesh is not None:
        from ..parallel.mesh import run_final_sharded
        accums, binned_acc, energy_current, killed_int, n_steps = \
            run_final_sharded(
                mesh, geometry, dt, st, density, jnu_var_id, jnu_var_frac,
                list(groups), key, n_photons, batch_size, config_tuple,
                binned_group=binned_group, binned_dims=binned_dims,
                se_rho=se_rho, mrw=mrw_tables)
    else:
        accums, binned_acc, energy_current, killed_int, n_steps = \
            _run_final_jit(
                geometry, dt, st, density, jnu_var_id, jnu_var_frac,
                list(groups), key, n_photons, batch_size, config_tuple,
                binned_group=binned_group, binned_dims=binned_dims,
                se_rho=se_rho, mrw=mrw_tables)
    return accums, binned_acc, float(energy_current), \
        dict(killed_int=int(killed_int), n_steps=int(n_steps))
