#!/bin/sh
# Install the repo's git hooks (hooks are not cloned — re-run after clone).
set -e
repo_root="$(git rev-parse --show-toplevel)"
hook="$repo_root/.git/hooks/pre-commit"
tmp="$hook.new.$$"
cat > "$tmp" << 'EOF'
#!/bin/sh
# bench-regression gate: only when BENCH_FULL.json is staged.
if git diff --cached --name-only | grep -q '^BENCH_FULL\.json$'; then
    python "$(git rev-parse --show-toplevel)/scripts/bench_gate.py" || exit 1
fi
EOF
# Never silently clobber a pre-existing hook that differs (ADVICE r10):
# back it up alongside so the user's/another tool's hook is recoverable.
if [ -e "$hook" ] && ! cmp -s "$hook" "$tmp"; then
    backup="$hook.bak.$(date +%Y%m%d%H%M%S)"
    cp "$hook" "$backup"
    echo "existing differing pre-commit hook backed up to $backup" >&2
fi
mv "$tmp" "$hook"
chmod +x "$hook"
echo "installed $hook"
