python - <<'EOF'
c = open('/root/repo/PLANS.md').read()
c = c.replace("Regenerate: `python scripts_gen_plans.py` (or see git history). These are\nthe plans the guardrails in tests/test_plans.py assert on — pushdown\nreaching scans, broadcast exchanges on dims, bounded top-k heaps, no\nstray CartesianProduct, partial+final aggregation.",
"Regenerate: `python scripts/gen_plans.py`. These are the plans the\nguardrails in tests/test_plans.py assert on — pushdown reaching scans,\nbroadcast exchanges on dims, bounded top-k heaps, no stray\nCartesianProduct, partial+final aggregation.")
open('/root/repo/PLANS.md','w').write(c)
