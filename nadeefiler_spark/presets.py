"""Default rule set for the input_hint clips schema (BASELINE.json)."""

from __future__ import annotations

from . import audio
from .drift import DriftRule
from .rules.audio_rules import default_audio_rules
from .rules.base import Rule
from .rules.constraints import (
    DomainRule,
    MatchRule,
    ReferentialRule,
    RequiredRule,
    UniquenessRule,
)


def default_clip_rules(
    with_refs: bool = True,
    with_audio: bool = True,
    with_drift: bool = True,
    with_pii: bool = False,
    with_mvo: bool = False,
    with_header_triage: bool = False,
) -> list[Rule]:
    rules: list[Rule] = [
        UniquenessRule(keys=("clip_id",)),
        DomainRule(name="sr_domain", column="sr_hz", allowed=audio.VALID_SR),
        RequiredRule(name="transcript_required", column="transcript"),
        # SpeakingRateRule (constraints.py) is deliberately NOT in this
        # preset: the synthetic corpus compresses durations to 40-200 ms
        # for test speed, so a chars-per-second plausibility check would
        # correctly flag nearly every row. On real speech data add
        # SpeakingRateRule() here — it folds into the same shared scan.
    ]
    if with_pii:
        # opt-in: folds into the same shared constraints scan via the
        # predicate fast-path; off by default because the synthetic
        # transcripts carry no PII to find
        from .rules.constraints import PiiRule

        rules.append(PiiRule(column="transcript"))
    if with_header_triage:
        # opt-in: the decode-free triage tier (header magic/rate/length
        # vs declared columns) folded into the shared constraints scan.
        # Off by default because the planted container mismatches are
        # owned by the decode-tier goldens; turn on for the two-tier
        # layout where decode runs on flagged + sampled rows only.
        from .rules.audio_rules import HeaderTriageRule

        rules.append(HeaderTriageRule())
    if with_refs:
        rules.append(ReferentialRule(name="ref_integrity", key="clip_id"))
        rules.append(MatchRule(name="transcript_equality", key="clip_id", column="transcript"))
    if with_audio:
        rules.extend(default_audio_rules())
    if with_drift:
        # clips partitioning is derived from codec -> exclude it
        rules.append(DriftRule(exclude_keys=("codec",)))
    if with_mvo:
        # opt-in: joint record-level outlier gate across the numeric
        # clip columns (diagonal Mahalanobis; catches rows every
        # univariate z-gate passes). Off by default because its stats
        # pass is an extra aggregate over the scoped clips.
        from .outliers import MultivariateOutlierRule

        rules.append(MultivariateOutlierRule(columns=("sr_hz", "dur_ms")))
    return rules


def default_clip_expectations() -> list:
    """Dataset-contract suite for the input_hint clips schema
    (engine.run_expectations default): the per-PARTITION envelope the
    per-row rules assert row-by-row. Strict thresholds are the point —
    on the synthetic corpus the planted duplicate clip_ids and invalid
    sr_hz values FAIL their checks, which is the verdict a validation
    engine owes its caller (tests pin the exact failing set)."""
    from . import expectations as E

    return [
        E.size_between(1),
        E.uniqueness("clip_id", 1.0),
        E.completeness("bytes", 1.0),
        E.completeness("transcript", 0.95),
        E.values_in("sr_hz", list(audio.VALID_SR), 1.0),
        E.min_at_least("dur_ms", 1.0),
    ]
