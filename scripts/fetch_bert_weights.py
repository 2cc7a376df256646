#!/usr/bin/env python
"""Bootstrap published BERT weights + vocab for offline training hosts.

The reference loads published checkpoints by name at startup
(ref train.py:70 ``from_pretrained('bert-large-uncased')``); zero-egress
hosts can't.  Run THIS on a networked machine:

    python scripts/fetch_bert_weights.py bert-large-uncased out/

then copy ``out/`` across and train with

    python -m msa_tpu.cli.train --pretrained out/bert-large-uncased.pt \
        --vocab out/vocab.txt ...

On a host whose HF cache already has the model, cli/train also accepts the
bare name: ``--pretrained bert-large-uncased`` (resolved through
transformers' cache without network).
"""

import argparse
import os
import sys


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model", nargs="?", default="bert-large-uncased")
    p.add_argument("out_dir", nargs="?", default=".")
    args = p.parse_args()

    import torch
    from transformers import BertForPreTraining, BertTokenizer

    os.makedirs(args.out_dir, exist_ok=True)
    model = BertForPreTraining.from_pretrained(args.model)
    pt_path = os.path.join(args.out_dir, f"{args.model}.pt")
    torch.save(model.state_dict(), pt_path)

    tok = BertTokenizer.from_pretrained(args.model)
    vocab_path = os.path.join(args.out_dir, "vocab.txt")
    tok.save_vocabulary(args.out_dir)

    print(f"wrote {pt_path} and {vocab_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
