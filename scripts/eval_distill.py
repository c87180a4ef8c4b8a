"""Distilled-student quality vs teacher at matched NFE (VERDICT r3 next #2).

Progressive distillation's claim (arXiv:2202.00512 §3) is that a student
distilled to T_s steps samples comparably to the many-step teacher and far
better than the teacher naively respaced to the student's NFE.  This script
builds that table on the synthetic-data Frechet metric used by every other
quality study here (scripts/eval_reuse_distributional.py):

  teacher: exact full-T ancestral, DDIM at NFE = {T_s, 50, 25, 10}
  student: exact full-T_s ancestral (= T_s NFE), DDIM at {50, 25, 10}

Usage: python scripts/eval_distill.py <teacher_run> <student_run> [n=128]
Writes docs/results/distill_T<T_s>.json.
"""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))
from eval_reuse_distributional import features, frechet  # noqa: E402


def main():
    teacher_run = sys.argv[1]
    student_run = sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    from probabilisticdeepdiffusionmodels_tpu.cli.sample import (
        load_engine_from_run,
    )
    from probabilisticdeepdiffusionmodels_tpu.data.datasets import (
        make_synthetic,
    )
    from probabilisticdeepdiffusionmodels_tpu.evals import (
        knn_precision_recall,
    )

    teacher, cfg = load_engine_from_run(teacher_run)
    student, _ = load_engine_from_run(student_run)
    T_s = student.diffusion_steps

    dcfg = cfg.get("data", {})
    ds = make_synthetic(
        resolution=int(cfg["engine"]["resolution"]),
        channels=int(dcfg.get("channels", 3)),
        n=int(dcfg.get("n", 2048)),
    )
    data = ds.images.astype(np.float32) / 255.0 * 2.0 - 1.0
    rng = np.random.default_rng(0)
    perm = rng.permutation(len(data))
    half = len(data) // 2
    f_data, f_data2 = features(data[perm[:half]]), features(data[perm[half:]])

    out = {
        "teacher": teacher_run, "student": student_run,
        "teacher_T": teacher.diffusion_steps, "student_T": T_s,
        "n_samples": n,
        "dataset_split_half_floor": round(frechet(f_data, f_data2), 4),
    }

    def score(tag, engine, **kw):
        s = np.asarray(engine.generate_images(n=n, minibatch=n, seed=123, **kw))
        assert np.isfinite(s).all(), f"non-finite at {tag}"
        f_s = features(s)
        pr = knn_precision_recall(f_data, f_s)
        out[tag] = {
            "frechet_to_data": round(frechet(f_data, f_s), 4),
            "std": round(float(s.std()), 5),
            "precision": round(pr["precision"], 4),
            "recall": round(pr["recall"], 4),
        }
        print(tag, out[tag], flush=True)

    score("teacher_exact", teacher)
    for nfe in [T_s, 50, 25, 10]:
        if nfe < teacher.diffusion_steps:
            score(f"teacher_ddim_{nfe}", teacher, ddim=True,
                  num_sample_steps=nfe)
    score(f"student_exact_{T_s}", student)
    for nfe in [50, 25, 10]:
        if nfe < T_s:
            score(f"student_ddim_{nfe}", student, ddim=True,
                  num_sample_steps=nfe)

    dest = Path("docs/results")
    dest.mkdir(parents=True, exist_ok=True)
    (dest / f"distill_T{T_s}.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
