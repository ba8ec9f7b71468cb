"""The gen-sf1 oracle gate's query list must not rot: every name in
tools/oracle_gate.py must exist in the registry (a renamed query would
otherwise silently drop out of the 100x answer gate), and reasoned
skips must carry a reason."""

from __future__ import annotations

import sys

sys.path.insert(0, "tools")

from e_commerce_data_lakehouse_spark import entry_queries as eq


def test_scale_sensitive_names_exist():
    from oracle_gate import ALL_MODE_SKIPS, SCALE_SENSITIVE

    missing = [n for n, _ in SCALE_SENSITIVE if n not in eq.QUERIES]
    assert not missing, f"gate list names not in registry: {missing}"
    missing = [n for n in ALL_MODE_SKIPS if n not in eq.QUERIES]
    assert not missing, f"--all skip names not in registry: {missing}"


def test_skips_carry_reasons():
    from oracle_gate import ALL_MODE_SKIPS, SCALE_SENSITIVE

    for n, reason in SCALE_SENSITIVE:
        assert reason is None or len(reason) > 20, n
    for n, reason in ALL_MODE_SKIPS.items():
        assert len(reason) > 20, n


def test_gate_covers_the_scale_defect_families():
    """The families whose r6-r8 defects were answer-threatening at scale
    must each have at least one gated (non-skipped) representative."""
    from oracle_gate import SCALE_SENSITIVE

    gated = {n for n, r in SCALE_SENSITIVE if r is None}
    families = {
        "ranking": {"rfm_segments", "abc_revenue_classes",
                    "classifier_decile_lift", "customer_global_spend_rank"},
        "fixed_point": {"order_value_gini", "ngram_lm_scores",
                        "ewma_daily_revenue"},
        "token_similarity": {"near_dup_token_jaccard",
                             "containment_dup_flags",
                             "fuzzy_decontamination"},
        "graph_fixpoint": {"dup_clusters_cc", "copurchase_triangles",
                           "kcore_copurchase"},
        "basket": {"basket_association_rules"},
    }
    for fam, names in families.items():
        assert gated & names, f"no gated representative for {fam}"
