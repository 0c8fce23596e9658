"""Unit coverage for bench.py's reliability machinery (round 5): the
best-so-far ranking, the print-once contract, and the JSON shape the
driver parses. No TPU, no compiles -- the measurement path itself is
exercised by the graded runs (BENCHMARKS.md round-5 record)."""

import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench  # noqa: E402


def test_best_ranking_and_print_once(capsys):
    best = bench._Best(batch=16)
    # nothing measured: exit 1, no output
    assert best.print_once() == 1
    assert capsys.readouterr().out == ''
    # already printed (even the empty case): later prints are no-ops
    best.publish(0.010, 'differential')
    assert best.print_once() == 0
    assert capsys.readouterr().out == ''


def test_best_differential_supersedes_coarse(capsys):
    best = bench._Best(batch=16)
    best.publish(0.020, 'coarse')
    # a SLOWER differential still replaces the coarse reading (coarse
    # pays serial relay latency and reads low)
    best.publish(0.030, 'differential')
    # a faster differential wins among equals
    best.publish(0.012, 'differential')
    # a later coarse reading can never downgrade a differential
    best.publish(0.005, 'coarse')
    assert best.print_once() == 0
    out = json.loads(capsys.readouterr().out)
    assert out['metric'] == 'train_images_per_sec_per_chip'
    assert out['unit'] == 'img/s'
    assert out['value'] == round(16 / 0.012, 2)
    assert out['vs_baseline'] == round(
        (16 / 0.012) / bench.A100_TORCH_ANCHOR_IMG_S, 3)


def test_best_is_thread_safe_under_concurrent_publish():
    import threading
    best = bench._Best(batch=16)

    def spam(dt):
        for _ in range(200):
            best.publish(dt, 'differential')

    ts = [threading.Thread(target=spam, args=(0.01 + i * 1e-4,))
          for i in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert best._dt == 0.01
