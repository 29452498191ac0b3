"""Scripted fake METEOR jar speaking the -stdio protocol
(reference lib/capeval/meteor/meteor.py:15-58):

  in : SCORE ||| ref1 ||| ref2 ... ||| hyp     -> out: one stats line
  in : EVAL ||| stats1 ||| stats2 ...          -> out: one score line per
                                                  stats, then the final line

The fake emits deterministic values derived from the inputs so the
wrapper's write/read pairing and ordering can be asserted exactly:
stats = "<n_refs> <n_hyp_tokens>"; score = n_refs + n_hyp_tokens / 100;
final = sum(scores).
"""
import sys


def main():
    for line in sys.stdin:
        line = line.rstrip("\n")
        if line.startswith("SCORE"):
            parts = line.split(" ||| ")
            refs, hyp = parts[1:-1], parts[-1]
            print(f"{len(refs)} {len(hyp.split())}", flush=True)
        elif line.startswith("EVAL"):
            stats = line.split(" ||| ")[1:]
            scores = []
            for st in stats:
                n_refs, n_hyp = st.split()
                scores.append(int(n_refs) + int(n_hyp) / 100.0)
            for s in scores:
                print(f"{s:.6f}", flush=True)
            print(f"{sum(scores):.6f}", flush=True)


if __name__ == "__main__":
    main()
