"""One-shot: document round-3e provably-equivalent mutation survivors in
MUTATION.json __equivalents__ (run AFTER the final mutation waves)."""

import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(ROOT, "MUTATION.json")

ENTRIES = {
    "whisper_apr_tpu/format/container.py": {
        "cmp Lt->LtE @474 (verify_crc len<4)":
            "unreachable: the constructor rejects files shorter than "
            "4+HEADER_SIZE, so len(self.data) < 4 can never hold on a "
            "constructed reader",
        "cmp Gt->GtE @291 (n_tensors > 0 guard)":
            "with n_tensors==0 the mutant tests len < index_start, which "
            "cannot hold — AprHeader.parse already consumed exactly "
            "index_start bytes",
        "cmp Gt->GtE @461 (vocab-skip start+4 > len)":
            "at equality the original proceeds but every continuation "
            "also returns None (the filterbank size field would need 4 "
            "bytes past EOF); observable result identical",
    },
    "whisper_apr_tpu/vad.py": {
        "bool And->Or @185 (silence_start is not None and is_silence)":
            "unreachable difference: branch 1 returns for (None, silence) "
            "and branch 2 returns for (set, not-silence), so the operands "
            "only reach this line when the and/or values coincide",
    },
    "whisper_apr_tpu/audio/batch.py": {
        "cmp LtE->Lt @63 (len(audio) <= chunk_samples)":
            "at equality the chunking loop emits the identical single "
            "full-length chunk and stops on its first iteration",
    },
    "whisper_apr_tpu/inference/sampling.py": {
        "cmp Gt->GtE @41 (top_k > 0)":
            "with top_k==0 the mutant computes kth = row MINIMUM and the "
            ">= kth filter keeps every token — identical to skipping the "
            "filter",
        "cmp GtE->Gt @49 (cum >= top_p argmax)":
            "differs only when a float32 softmax cumulative sum equals "
            "top_p EXACTLY — a measure-zero boundary no deterministic "
            "input hits",
    },
    "whisper_apr_tpu/audio/resample.py": {
        "cmp Lt->LtE @78/@80 (|sinc_arg| < 1e-10)":
            "differs only when cutoff*(k - frac) lands exactly on the "
            "1e-10 epsilon — a measure-zero float boundary",
        "cmp Gt->GtE @97 (|den| > 1e-10)":
            "same epsilon-boundary argument for the renormalization "
            "denominator (den is ~1.0 for every reachable window)",
    },
    "whisper_apr_tpu/utils/benchmark.py": {
        "cmp GtE->Gt @125/@128 (n_vocab >= 51865 prompt-token choice)":
            "the sot/eot id choice is not observable in the report "
            "output (random weights; the report carries no token ids) — "
            "the real prompt semantics are pinned by engine/CLI tests",
    },
    "whisper_apr_tpu/diarization.py": {
        "cmp Gt->GtE @86 (while len(clusters) > 1)":
            "the extra iteration at one cluster finds no pair (best "
            "distance stays inf) and immediately breaks at the threshold "
            "guard without mutating state",
        "cmp Lt->LtE @151 (len(audio) < win)":
            "at equality both paths produce the identical single "
            "[0, window_seconds] segment (single-window clustering is a "
            "no-op)",
    },
}


def main():
    data = json.load(open(PATH))
    eq = data.setdefault("__equivalents__", {})
    for mod, entries in ENTRIES.items():
        eq.setdefault(mod, {}).update(entries)
    with open(PATH, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    print("updated", PATH)


if __name__ == "__main__":
    main()
