"""Generate cfg/validate/baselines.yaml: per-(model, dataset, align) metric
means over the reference's published per-seed result YAMLs."""
import collections
from pathlib import Path
import yaml

ROOT = Path('/root/reference/results')
KEEP = ['AbsRel', 'F-Score (10)', 'RMSE', 'MAE', '$\\delta_{.25}$']

out = {}
for exp in sorted(ROOT.iterdir()):
    if exp.name == 'mapfree' or not exp.is_dir():
        continue
    for model in sorted(exp.iterdir()):
        if not model.is_dir():
            continue
        acc = collections.defaultdict(lambda: collections.defaultdict(list))
        seeds = set()
        for f in sorted(model.glob('*/results/*.yaml')):
            seed = f.parents[1].name
            stem = f.stem  # <dataset>_<ckpt>_<align>
            parts = stem.rsplit('_', 2)
            if len(parts) != 3:
                continue
            ds, ckpt, align = parts
            try:
                data = yaml.safe_load(f.read_text())
            except Exception:
                continue
            if not isinstance(data, dict):
                continue
            seeds.add(seed)
            for k in KEEP:
                if k in data and data[k] is not None:
                    acc[(ds, ckpt, align)][k].append(float(data[k]))
        if not acc:
            continue
        mkey = f'{exp.name}/{model.name}'
        out[mkey] = {'_seeds': sorted(seeds)}
        for (ds, ckpt, align), md in sorted(acc.items()):
            e = out[mkey].setdefault(ds, {}).setdefault(ckpt, {})
            e[align] = {k: round(sum(v) / len(v), 4) for k, v in sorted(md.items())}

hdr = """\
# Reference accuracy baselines: per-(experiment/model, dataset, ckpt, align)
# metric MEANS over the published per-seed result YAMLs of the reference repo
# (jspenmar/slowtv_monodepth `results/<exp>/<model>/<seed>/results/
# <dataset>_<ckpt>_<align>.yaml`; see BASELINE.md). `_seeds` lists the seeds
# averaged. Units per reference `src/core/metrics.py:65-105` (AbsRel,
# F-Score, delta in %; RMSE/MAE in m). Consumed by
# `api/eval/validate_release.py` (slowtv-validate-release).
# Regenerate: tools/gen_baselines.py (requires the reference checkout).
"""
text = hdr + yaml.safe_dump(out, sort_keys=False, default_flow_style=False)
Path('/root/repo/cfg/validate').mkdir(parents=True, exist_ok=True)
Path('/root/repo/cfg/validate/baselines.yaml').write_text(text)
print(f'{len(out)} models,', sum(len(v) - 1 for v in out.values()), 'dataset entries')
