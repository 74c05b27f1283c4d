"""Optional third-party library integrations (env-gated imports)."""
