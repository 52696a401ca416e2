#!/usr/bin/env python3
"""Section-aware normalized PLANS.md diff — the plan-identity discipline.

Usage:
    python3 tools/plandiff.py <ref>            # diff PLANS.md vs git <ref>
    python3 tools/plandiff.py <fileA> <fileB>  # diff two PLANS.md files
    ... [-v section_name]                      # print one section's diff

Normalizes away everything that legitimately varies run-to-run — exprIds,
codegen/plan/RDD ids, AQE stage numbers, JVM lambda identities, /tmp paths,
cutLineage call sites (body AND staged-section headers) — so a non-empty
diff means the PHYSICAL PLAN changed, which must then be adjudicated
(intended refactor vs regression). Convention: run against the previous
round's close commit before recording SCRATCH_r{N}; every changed section
gets one line of adjudication in the round record.
"""
import re, subprocess, sys, difflib, tempfile, os

NORM = [
    (r'#\d+', '#N'), (r'\(\d+\)', '(N)'), (r'plan_id=\d+', 'plan_id=N'),
    (r'/tmp/\S+', '/tmp/X'), (r'cutLineage at \S+:\d+', 'cutLineage at X'),
    (r'\*\(\d+\)', '*(N)'),
    (r'Lambda\$\d+/0x[0-9a-f]+', 'Lambda$N'),         # JVM lambda identity
    (r'@[0-9a-f]{6,}', '@X'),                          # object hashes
    (r'MapPartitionsRDD\[\d+\]', 'MapPartitionsRDD[N]'),
    (r'isFinalPlan=\w+', 'isFinalPlan=X'),
    (r'ResultQueryStage \d+', 'RQS'), (r'ShuffleQueryStage \d+', 'SQS'),
    (r'BroadcastQueryStage \d+', 'BQS'), (r'TableCacheQueryStage \d+', 'TQS'),
    (r'graft_bj_\S+', 'graft_bj_X'),
]
# staged-section headers carry the cut call site's line number, which moves
# with unrelated edits: "q — staged plan 3 (pre-cut at Foo.scala:297)"
HDR = re.compile(r'\(pre-cut at (\S+?):\d+\)')


def norm_line(s):
    for pat, rep in NORM:
        s = re.sub(pat, rep, s)
    return s


def sections(path):
    secs, cur, buf = {}, None, []
    for line in open(path):
        m = re.match(r'^## (\S.*)$', line) or re.match(r'^### (\S.*)$', line)
        if m:
            if cur is not None:
                secs[cur] = buf
            cur = HDR.sub(r'(pre-cut at \1:N)', m.group(1).strip())
            buf = []
            continue
        if cur is not None:
            buf.append(norm_line(line))
    if cur is not None:
        secs[cur] = buf
    return secs


def from_ref(ref):
    blob = subprocess.run(['git', 'show', f'{ref}:PLANS.md'],
                          capture_output=True, text=True, check=True).stdout
    f = tempfile.NamedTemporaryFile('w', suffix='.md', delete=False)
    f.write(blob); f.close()
    return f.name


def main():
    args = [a for a in sys.argv[1:] if not a.startswith('-')]
    verbose = sys.argv[sys.argv.index('-v') + 1] if '-v' in sys.argv else None
    if len(args) == 1:
        a, b = from_ref(args[0]), 'PLANS.md'
    elif len(args) == 2:
        a, b = args
        if not os.path.exists(a):
            a = from_ref(a)
    else:
        print(__doc__); sys.exit(2)
    sa, sb = sections(a), sections(b)
    prev_only = sorted(set(sa) - set(sb))
    new_only = sorted(set(sb) - set(sa))
    changed = sorted(k for k in set(sa) & set(sb) if sa[k] != sb[k])
    print(f'sections: prev {len(sa)}, new {len(sb)}')
    print(f'prev-only ({len(prev_only)}): {prev_only}')
    print(f'new-only ({len(new_only)}): {new_only}')
    print(f'changed ({len(changed)}): {changed}')
    if verbose:
        for k in changed:
            if verbose in k:
                print(f'--- {k}')
                sys.stdout.writelines(
                    difflib.unified_diff(sa[k], sb[k], lineterm='\n'))
    sys.exit(1 if (prev_only or new_only or changed) else 0)


if __name__ == '__main__':
    main()
