#!/usr/bin/env python
"""Token-level similarity check of repo files vs reference twins.

Strips docstrings/comments, tokenizes, and reports the fraction of repo-file
token trigrams that also appear in the reference twin (order-insensitive bag
overlap of 3-grams). Used to keep rewritten front-end files honestly original
(goal from VERDICT.md: <40% on rewritten files).
"""
import io
import sys
import tokenize


def tokens(path):
    out = []
    with open(path, "rb") as f:
        src = f.read()
    try:
        for tok in tokenize.tokenize(io.BytesIO(src).readline):
            if tok.type in (tokenize.COMMENT, tokenize.NL, tokenize.NEWLINE,
                            tokenize.INDENT, tokenize.DEDENT, tokenize.ENCODING,
                            tokenize.ENDMARKER):
                continue
            if tok.type == tokenize.STRING and (
                    tok.string.startswith('"""') or tok.string.startswith("'''")):
                continue
            out.append(tok.string)
    except tokenize.TokenError:
        pass
    return out


def trigrams(toks):
    from collections import Counter
    return Counter(tuple(toks[i:i + 3]) for i in range(len(toks) - 2))


def similarity(repo_path, ref_path):
    a, b = trigrams(tokens(repo_path)), trigrams(tokens(ref_path))
    if not a:
        return 0.0
    inter = sum(min(a[k], b[k]) for k in a if k in b)
    return inter / max(1, sum(a.values()))


PAIRS = [
    ("hyperion_tpu/util/convenience.py", "hyperion/util/convenience.py"),
    ("hyperion_tpu/model/analytical_yso_model.py", "hyperion/model/analytical_yso_model.py"),
    ("hyperion_tpu/densities/flared_disk.py", "hyperion/densities/flared_disk.py"),
    ("hyperion_tpu/densities/alpha_disk.py", "hyperion/densities/alpha_disk.py"),
    ("hyperion_tpu/densities/power_law_envelope.py", "hyperion/densities/power_law_envelope.py"),
    ("hyperion_tpu/densities/ambient_medium.py", "hyperion/densities/ambient_medium.py"),
    ("hyperion_tpu/densities/ulrich_envelope.py", "hyperion/densities/ulrich_envelope.py"),
    ("hyperion_tpu/densities/bipolar_cavity.py", "hyperion/densities/bipolar_cavity.py"),
    ("hyperion_tpu/model/image.py", "hyperion/model/image.py"),
    ("hyperion_tpu/model/sed.py", "hyperion/model/sed.py"),
    ("hyperion_tpu/grid/cartesian_grid.py", "hyperion/grid/cartesian_grid.py"),
    ("hyperion_tpu/grid/cylindrical_polar_grid.py", "hyperion/grid/cylindrical_polar_grid.py"),
    ("hyperion_tpu/grid/spherical_polar_grid.py", "hyperion/grid/spherical_polar_grid.py"),
    ("hyperion_tpu/grid/amr_grid.py", "hyperion/grid/amr_grid.py"),
    ("hyperion_tpu/grid/octree_grid.py", "hyperion/grid/octree_grid.py"),
    ("hyperion_tpu/sources/source.py", "hyperion/sources/source.py"),
    ("hyperion_tpu/dust/dust_type.py", "hyperion/dust/dust_type.py"),
    ("hyperion_tpu/dust/emissivities.py", "hyperion/dust/emissivities.py"),
    ("hyperion_tpu/dust/mean_opacities.py", "hyperion/dust/mean_opacities.py"),
    ("hyperion_tpu/dust/optical_properties.py", "hyperion/dust/optical_properties.py"),
    ("hyperion_tpu/filter/filter.py", "hyperion/filter/filter.py"),
    ("hyperion_tpu/model/model.py", "hyperion/model/model.py"),
    ("hyperion_tpu/model/model_output.py", "hyperion/model/model_output.py"),
    ("hyperion_tpu/conf/conf_files.py", "hyperion/conf/conf_files.py"),
]

if __name__ == "__main__":
    import os
    repo, ref = "/root/repo", "/root/reference"
    rows = []
    for rp, fp in PAIRS:
        p1, p2 = os.path.join(repo, rp), os.path.join(ref, fp)
        if not (os.path.exists(p1) and os.path.exists(p2)):
            continue
        rows.append((similarity(p1, p2), rp))
    for s, rp in sorted(rows, reverse=True):
        flag = " <-- HIGH" if s >= 0.40 else ""
        print(f"{s * 100:5.1f}%  {rp}{flag}")
