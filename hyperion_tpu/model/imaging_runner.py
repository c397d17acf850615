"""Run the imaging iteration for a model and write /Peeled groups into the
.rtout file with the reference layout (ref: image_write,
src/images/image_type.f90:608-788): datasets 'seds' (n_stokes, n_orig,
n_view, n_ap, n_nu) and 'images' (n_stokes, n_orig, n_view, n_y, n_x, n_nu),
nu*Fnu normalization via dnunorm, cumulative apertures, and sqrt(sum x^2)
uncertainty channels."""

import numpy as np


def run_imaging(model, out, geometry, dt, st, density, specific_energy,
                batch_size, dtype, mesh=None, user_batch_size=None):
    import jax
    import jax.numpy as jnp
    from ..transport.imaging import (build_peel_group, build_binned_group,
                                     run_final)

    if not model.peeled_output and model.binned_output is None:
        return

    n_sources = max(len(model.sources), 1)
    n_dust = dt.n_dust
    groups = [build_peel_group(conf, dtype=dtype,
                               length_scale=geometry.length_scale,
                               n_sources=n_sources, n_dust=n_dust)
              for conf in model.peeled_output]
    if model._monochromatic:
        _run_imaging_mono(model, out, geometry, dt, st, density,
                          specific_energy, groups, batch_size, dtype,
                          mesh=mesh, user_batch_size=user_batch_size)
        return

    n_phot = model.n_photons.get('last')
    if n_phot is None:
        raise Exception("imaging photon count has not been set "
                        "(set_n_photons(imaging=...))")
    binned_group = None
    binned_dims = None
    if model.binned_output is not None:
        binned_group = build_binned_group(model.binned_output, dtype=dtype,
                                          length_scale=geometry.length_scale,
                                          n_sources=n_sources, n_dust=n_dust)
        binned_dims = (model.binned_output.n_theta, model.binned_output.n_phi)

    key = jax.random.PRNGKey((abs(model._seed) + 1) % (2 ** 31))
    se = None
    if specific_energy is not None:
        se = jnp.asarray(specific_energy, dtype=dtype)

    # With raytracing enabled, the MC imaging iteration only peels scattered
    # light; direct + thermal emission comes from the raytracing pass
    # (ref main.f90:272-302: do_final(peeloff_scattering_only=use_raytracing))
    accums, binned_acc, energy_current, stats = run_final(
        geometry, dt, st, density, se, groups, key, n_phot,
        batch_size=batch_size,
        n_inter_max=model.n_inter_max,
        kill_on_scatter=model.kill_on_scatter,
        kill_on_absorb=model.kill_on_absorb,
        forced_first_interaction=model.forced_first_interaction,
        peeloff_scattering_only=model.raytracing,
        n_reabs_max=model.n_reabs_max,
        binned_group=binned_group, binned_dims=binned_dims,
        ffi_algorithm=model.forced_first_interaction_algorithm,
        ffi_baes16_xi=model.forced_first_interaction_baes16_xi,
        mesh=mesh,
        use_mrw=model.mrw, mrw_gamma=getattr(model, 'mrw_gamma', 1.0),
        n_mrw_max=getattr(model, 'n_inter_mrw_max', 1000))

    scale = float(st.energy_total) / max(energy_current, 1e-300)

    ray_sed = ray_img = None
    if model.raytracing:
        from ..transport.raytrace import (build_raytrace_tables,
                                          run_raytracing)
        n_ray_src = model.n_photons.get('raytracing_sources', 0)
        n_ray_dust = model.n_photons.get('raytracing_dust', 0)
        dusts = model._dust_objects()
        # all groups share the raytrace tables of the first group's
        # frequency grid only if identical; build per group
        ray_sed = [None] * len(groups)
        ray_img = [None] * len(groups)
        for gi, group in enumerate(groups):
            rt, var_grids, nu_edges = build_raytrace_tables(
                dusts, model.sources, dt, st, group,
                se if se is not None else jnp.zeros_like(density),
                density, geometry.volumes, dtype,
                length_scale=geometry.length_scale)
            key, k_ray = jax.random.split(key)
            seds, imgs = run_raytracing(
                geometry, dt, st, rt, var_grids, [group], density, k_ray,
                n_ray_src, n_ray_dust, batch_size, dtype,
                specific_energy=se if se is not None else
                jnp.zeros_like(density), mesh=mesh)
            ray_sed[gi] = seds[0]
            ray_img[gi] = imgs[0]

    g_peeled = out.create_group('Peeled')
    for i, (conf, group, acc) in enumerate(zip(model.peeled_output, groups,
                                               accums)):
        g = g_peeled.create_group('group_%05i' % (i + 1))
        extra = None
        if ray_sed is not None:
            extra = (ray_sed[i], ray_img[i])
        write_peel_group(g, conf, group, acc, scale, raytraced=extra)

    if binned_group is not None:
        # the binned datasets live directly under /Binned
        # (ref ModelOutput.get_sed: g = self.file['Binned'])
        g_binned = out.create_group('Binned')
        write_peel_group(g_binned, model.binned_output, binned_group,
                         binned_acc, scale)

    out.attrs['killed_photons_int_final'] = stats['killed_int']
    out.attrs['killed_photons_geo_final'] = 0


def _run_imaging_mono(model, out, geometry, dt, st, density, specific_energy,
                      groups, batch_size, dtype, mesh=None,
                      user_batch_size=None):
    """Monochromatic imaging: exact-frequency source + dust passes
    (ref: do_final_mono; dispatched from main.f90:272-274)."""
    import jax
    import jax.numpy as jnp
    from ..transport.mono import run_mono

    n_src = model.n_photons.get('last_sources', 0)
    n_dustp = model.n_photons.get('last_dust', 0)
    per_pass = max(n_src, n_dustp, 1)
    if user_batch_size is not None:
        # an explicitly user-supplied batch_size is honored even when wider
        # than the per-frequency budget
        batch_size = user_batch_size
    elif batch_size is None or batch_size > per_pass:
        # a batch much wider than the per-frequency budget just drags dead
        # lanes through every peel walk; clamp the auto default
        batch_size = max(1024, 1 << (per_pass - 1).bit_length())
    se = None
    if specific_energy is not None:
        se = jnp.asarray(specific_energy, dtype=dtype)

    key = jax.random.PRNGKey((abs(model._seed) + 3) % (2 ** 31))
    accums, stats = run_mono(
        geometry, dt, st, density, se, groups, key,
        model._frequencies, n_src, n_dustp,
        model.sources, model._dust_objects(),
        batch_size=batch_size, n_inter_max=model.n_inter_max,
        kill_on_scatter=model.kill_on_scatter,
        forced_first_interaction=model.forced_first_interaction,
        # with raytracing the MC pass peels scattered light only; the
        # direct component comes from the raytraced pass below
        # (ref main.f90:272 do_final_mono(..., use_raytracing))
        peeloff_scattering_only=model.raytracing,
        ffi_algorithm=model.forced_first_interaction_algorithm,
        ffi_baes16_xi=model.forced_first_interaction_baes16_xi,
        n_reabs_max=model.n_reabs_max, mesh=mesh)

    # raytraced direct + thermal emission at the exact frequencies
    # (ref main.f90:296-302: do_raytracing runs after do_final_mono too)
    ray_sed = ray_img = None
    if model.raytracing:
        from ..transport.raytrace import (build_raytrace_tables_mono,
                                          run_raytracing)
        n_ray_src = model.n_photons.get('raytracing_sources', 0)
        n_ray_dust = model.n_photons.get('raytracing_dust', 0)
        dusts = model._dust_objects()
        freqs = np.asarray(model._frequencies, float)
        ray_sed = [None] * len(groups)
        ray_img = [None] * len(groups)
        for gi, group in enumerate(groups):
            # each group images a contiguous slice of the mono frequencies
            fsub = freqs[group.iwav_min:group.iwav_min + group.n_nu]
            rt, var_grids = build_raytrace_tables_mono(
                dusts, model.sources, dt, st, fsub,
                se if se is not None else jnp.zeros_like(density),
                density, geometry.volumes, dtype,
                length_scale=geometry.length_scale)
            key, k_ray = jax.random.split(key)
            seds, imgs = run_raytracing(
                geometry, dt, st, rt, var_grids, [group], density, k_ray,
                n_ray_src, n_ray_dust, batch_size, dtype,
                specific_energy=se if se is not None else
                jnp.zeros_like(density), mesh=mesh)
            ray_sed[gi] = seds[0]
            ray_img[gi] = imgs[0]

    g_peeled = out.create_group('Peeled')
    for i, (conf, group, acc) in enumerate(zip(model.peeled_output, groups,
                                               accums)):
        g = g_peeled.create_group('group_%05i' % (i + 1))
        extra = None
        if ray_sed is not None:
            extra = (ray_sed[i], ray_img[i])
        write_peel_group(g, conf, group, acc, 1.0, raytraced=extra,
                         frequencies=np.asarray(model._frequencies, float))
    out.attrs['killed_photons_int_final'] = stats['killed_int']
    out.attrs['killed_photons_geo_final'] = 0


def write_peel_group(g, conf, group, acc, scale, raytraced=None,
                     frequencies=None):
    """Normalize accumulators and write one peeled group. ``raytraced``
    optionally carries (sed, img) luminosity-per-bin arrays from the
    raytracing pass, added before the dnunorm conversion."""
    from ..util.functions import bool2str

    n_nu = group.n_nu
    nu_min = 10.0 ** float(group.log10_nu_min)
    nu_max = 10.0 ** float(group.log10_nu_max)
    if group.monochromatic:
        # exact frequencies: multiply each bin by nu (F_nu -> nu*F_nu,
        # ref image_type.f90:678-683); the conversion happens via nu_norm
        nu_norm = frequencies[group.iwav_min:group.iwav_min + n_nu]
    elif group.use_filters:
        # the filter tn table already carries the normalization and the x nu
        # factor — write raw sums (ref image_type.f90:650-654 dnunorm=1)
        dnunorm = 1.0
        nu_norm = None
    else:
        # F_nu*dnu -> nu*F_nu conversion factor (ref image_type.f90:624-658)
        dnunorm = (nu_max / nu_min) ** (+0.5 / n_nu) - \
                  (nu_max / nu_min) ** (-0.5 / n_nu)
        nu_norm = None

    g.attrs['inside_observer'] = bool2str(group.inside)
    if group.monochromatic:
        freq = np.zeros(n_nu, dtype=[('nu', float)])
        freq['nu'] = nu_norm
        g.create_dataset('frequencies', data=freq)
    elif group.use_filters:
        # channel axis = the filters' central frequencies
        freq = np.zeros(n_nu, dtype=[('nu', float)])
        freq['nu'] = [filt.central_nu for filt in conf._filters]
        g.create_dataset('frequencies', data=freq)
    # depth attributes only exist on peeled groups
    d_min = getattr(conf, 'd_min', None)
    d_max = getattr(conf, 'd_max', None)
    g.attrs['d_min'] = -np.inf if d_min is None else d_min
    g.attrs['d_max'] = +np.inf if d_max is None else d_max

    io_dtype = np.float32 if conf.io_bytes == 4 else np.float64

    if group.compute_sed:
        # acc.sed: (n_view, n_ap, n_nu, n_orig) ->
        # on disk: (n_stokes, n_orig, n_view, n_ap, n_nu)
        sed = np.asarray(acc.sed, dtype=np.float64) * scale
        if raytraced is not None and raytraced[0] is not None:
            # raytraced (direct+thermal) light is unpolarized -> Stokes I
            sed[..., 0] = sed[..., 0] + raytraced[0]
        unc = np.sqrt(np.asarray(acc.sed2, dtype=np.float64)) * scale
        if group.monochromatic:
            sed = sed * nu_norm[None, None, :, None, None]
            unc = unc * nu_norm[None, None, :, None, None]
        else:
            sed = sed / dnunorm
            unc = unc / dnunorm
        # (n_view, n_ap, n_nu, n_orig, n_stokes) ->
        # (n_stokes, n_orig, n_view, n_ap, n_nu)
        sed = sed.transpose(4, 3, 0, 1, 2)
        sed = np.cumsum(sed, axis=3)  # cumulative apertures
        dset = g.create_dataset('seds', data=sed.astype(io_dtype),
                                compression='gzip')
        if not (group.monochromatic or group.use_filters):
            dset.attrs['numin'] = nu_min
            dset.attrs['numax'] = nu_max
        dset.attrs['apmin'] = conf.ap_min
        dset.attrs['apmax'] = conf.ap_max
        _write_origin_attrs(dset, group)
        if group.uncertainties:
            unc = unc.transpose(4, 3, 0, 1, 2)
            unc = np.sqrt(np.cumsum(unc ** 2, axis=3))
            d2 = g.create_dataset('seds_unc', data=unc.astype(io_dtype),
                                  compression='gzip')
            if not (group.monochromatic or group.use_filters):
                d2.attrs['numin'] = nu_min
                d2.attrs['numax'] = nu_max

    if group.compute_image:
        # acc.img: (n_view, n_y, n_x, n_nu, n_orig) ->
        # on disk: (n_stokes, n_orig, n_view, n_y, n_x, n_nu)
        img = np.asarray(acc.img, dtype=np.float64) * scale
        if raytraced is not None and raytraced[1] is not None:
            img[..., 0] = img[..., 0] + raytraced[1]
        unc = np.sqrt(np.asarray(acc.img2, dtype=np.float64)) * scale
        if group.monochromatic:
            img = img * nu_norm[None, None, None, :, None, None]
            unc = unc * nu_norm[None, None, None, :, None, None]
        else:
            img = img / dnunorm
            unc = unc / dnunorm
        # (n_view, n_y, n_x, n_nu, n_orig, n_stokes) ->
        # (n_stokes, n_orig, n_view, n_y, n_x, n_nu)
        img = img.transpose(5, 4, 0, 1, 2, 3)
        dset = g.create_dataset('images', data=img.astype(io_dtype),
                                compression='gzip')
        if not (group.monochromatic or group.use_filters):
            dset.attrs['numin'] = nu_min
            dset.attrs['numax'] = nu_max
        dset.attrs['xmin'] = conf.xmin
        dset.attrs['xmax'] = conf.xmax
        dset.attrs['ymin'] = conf.ymin
        dset.attrs['ymax'] = conf.ymax
        _write_origin_attrs(dset, group)
        if group.uncertainties:
            unc = unc.transpose(5, 4, 0, 1, 2, 3)
            d2 = g.create_dataset('images_unc', data=unc.astype(io_dtype),
                                  compression='gzip')
            if not (group.monochromatic or group.use_filters):
                d2.attrs['numin'] = nu_min
                d2.attrs['numax'] = nu_max


def _write_origin_attrs(dset, group):
    """track_origin metadata the reader needs to slice components
    (ref ModelOutput._get_origin_slice)."""
    dset.attrs['track_origin'] = np.bytes_(group.track_origin)
    if group.track_origin == 'detailed':
        dset.attrs['n_sources'] = group.n_sources
        dset.attrs['n_dust'] = group.n_dust
    elif group.track_origin == 'scatterings':
        dset.attrs['track_n_scat'] = group.track_n_scat
