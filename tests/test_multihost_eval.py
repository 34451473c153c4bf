"""Multi-process eval-path parity (VERDICT round-2 item 7).

Two REAL ``jax.distributed`` CPU processes run the bucketed eval loop
over strided slices of a synthetic val set and merge results through
``collect_results_cpu`` (the rebuild of the reference's multi-GPU test
collection, open_set/apis/test.py:133-206); the merged metrics must be
identical to a single-process evaluation of the same config and params.
"""

import pytest


@pytest.mark.slow
def test_two_process_eval_matches_single(tmp_path):
    from betrayed_by_captions_tpu.parallel.eval_dryrun import run_eval_dryrun

    merged = run_eval_dryrun(str(tmp_path), nproc=2)
    # sanity: the instance metrics came through the merge
    assert any(k.startswith("all_results.segm") for k in merged), merged
