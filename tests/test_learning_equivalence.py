"""Unit tests for tools/learning_equivalence.py's pure helpers: the
periodic-eval cadence (must match mars_train.py:135's literal condition),
the evaluate_seq print parser, and the summary/verdict logic. The
free-running training comparison itself is a ~20-40 min tool run
(docs/PARITY.md records its results), not a CI test."""

import json
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from tools import learning_equivalence as leq


def test_eval_epochs_matches_literal_cadence():
    # mars_train.py:135: (epoch+1)%5==0 or (epoch+1)==epochs
    #                    or ((epoch+1)>30 and (epoch+1)%3==0)
    assert leq.eval_epochs(8) == [4, 7]
    assert leq.eval_epochs(5) == [4]
    assert leq.eval_epochs(1) == [0]
    got = leq.eval_epochs(40)
    expect = sorted({e for e in range(40) if (e + 1) % 5 == 0}
                    | {39} | {e for e in range(30, 40) if (e + 1) % 3 == 0})
    assert got == expect


def test_parse_eval_block_literal_format():
    text = ("Computing distance matrix\n"
            "Mean AP: 93.8%\n"
            "Rank-1  : 100.0%\n"
            "Rank-5  : 100.0%\n"
            "Rank-10 : 100.0%\n")
    block = leq.parse_eval_block(text)
    assert block == {"mAP": 93.8, "rank1": 100.0, "rank5": 100.0,
                     "rank10": 100.0}
    # repeated eval blocks: the LAST one wins (final periodic eval)
    block = leq.parse_eval_block(text + "Mean AP: 50.0%\nRank-1  : 62.5%\n")
    assert block["mAP"] == 50.0 and block["rank1"] == 62.5
    assert leq.parse_eval_block("no eval here") is None


def _fake_run(out, side, seed, mAP, rank1, steps=4):
    rec = {
        "side": side, "seed": seed,
        "loss_steps": [[i, 20.0 - i] for i in range(steps)],
        "evals": [{"epoch": 7, "mAP": mAP, "rank1": rank1,
                   "top1": rank1 / 100.0}],
        "wall_s": 1.0,
    }
    with open(osp.join(out, f"{side}_seed{seed}.json"), "w") as f:
        json.dump(rec, f)


def test_summarize_verdict_within_and_divergent(tmp_path):
    args = leq.build_parser().parse_args(["--out", str(tmp_path)])
    _fake_run(str(tmp_path), "ref", 0, 90.0, 95.0)
    _fake_run(str(tmp_path), "ref", 1, 84.0, 88.0)
    _fake_run(str(tmp_path), "grl", 0, 88.0, 92.0)
    s = leq.summarize(args)
    # |87-88| <= max(ref span 6.0, 5.0) -> within
    assert s["verdict"] == "WITHIN seed noise"
    assert s["ref"]["final_mAP"]["median"] == 87.0
    assert s["grl"]["seeds"] == [0]
    assert osp.exists(tmp_path / "summary.md")

    _fake_run(str(tmp_path), "grl", 1, 60.0, 55.0)
    s = leq.summarize(args)
    # grl median 74 vs ref 87: past the max(span, 5) envelope -> divergent
    assert s["verdict"] == "DIVERGENT"
