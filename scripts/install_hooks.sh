#!/bin/sh
# Install the repo's git hooks (hooks are not cloned — re-run after clone).
set -e
repo_root="$(git rev-parse --show-toplevel)"
hook="$repo_root/.git/hooks/pre-commit"
cat > "$hook" << 'EOF'
#!/bin/sh
# bench-regression gate: only when BENCH_FULL.json is staged.
if git diff --cached --name-only | grep -q '^BENCH_FULL\.json$'; then
    python "$(git rev-parse --show-toplevel)/scripts/bench_gate.py" || exit 1
fi
EOF
chmod +x "$hook"
echo "installed $hook"
