#!/bin/sh
# Git pre-commit hook: block commits that would leave HEAD un-importable
# (the round-2 failure mode). Delegates to scripts/precommit.py.
exec python "$(git rev-parse --show-toplevel)/scripts/precommit.py"
