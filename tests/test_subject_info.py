"""Parity: subject metadata parser vs the reference parse_subject_file, on
the reference's actual info-subjects.sh."""

import os
import pytest

from adaprompt_tpu.eval.subject_info import parse_subject_file, apply_subject_info

import torch_oracle

REF_FILE = "/root/reference/evaluation/info-subjects.sh"


@pytest.mark.skipif(not os.path.exists(REF_FILE), reason="reference absent")
def test_parse_matches_reference_parser():
    eval_utils = torch_oracle.load("evaluation.eval_utils")
    ref_info, ref_attr = eval_utils.parse_subject_file(REF_FILE)
    got_info, got_attr = parse_subject_file(REF_FILE)
    assert got_info["subjects"] == ref_info["subjects"]
    assert got_info["cls_delta_strings"] == ref_info["cls_delta_strings"]
    assert got_info["broad_classes"] == ref_info["broad_classes"]
    for var in ref_attr:
        assert got_attr.get(var) == ref_attr[var], var


def test_apply_subject_info():
    import dataclasses
    from adaprompt_tpu.data.dataset import SubjectInfo
    subs = [SubjectInfo("alice", ["a.jpg"], [None]),
            SubjectInfo("bob", ["b.jpg"], [None])]
    subj2attr = {"cls_delta_strings": {"alice": "woman", "bob": "man"},
                 "are_faces": {"alice": 1, "bob": 0}}
    out = apply_subject_info(subs, subj2attr)
    assert out[0].cls_delta_string == "woman"
    assert out[1].is_face is False
