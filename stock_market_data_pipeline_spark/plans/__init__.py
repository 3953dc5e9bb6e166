"""Composed end-to-end plans (the reference's 'jobs', as library calls)."""
