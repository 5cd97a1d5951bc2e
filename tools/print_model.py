"""Print a loaded model's arch spec, param-tree shapes and subset topology
(reference tools/print_model.py — there it prints the HF module tree)."""

import argparse
import sys

sys.path.insert(0, "/root/repo")


def shape_tree(node, prefix=""):
    lines = []
    if isinstance(node, dict):
        for k, v in node.items():
            lines += shape_tree(v, f"{prefix}.{k}" if prefix else k)
    elif isinstance(node, (list, tuple)):
        for i, v in enumerate(node):
            lines += shape_tree(v, f"{prefix}[{i}]")
    elif hasattr(node, "shape"):
        lines.append(f"{prefix:60s} {str(node.dtype):10s} {tuple(node.shape)}")
    return lines


def main():
    p = argparse.ArgumentParser("print_model")
    p.add_argument("--model_path", required=True)
    p.add_argument("--blocks", type=int, default=1,
                   help="how many blocks to print (weights repeat)")
    args = p.parse_args()

    from lightcompress_tpu.models.hf_loader import load_model

    model = load_model(args.model_path)
    print(f"arch: {model.arch}")
    print(f"num_blocks: {model.num_blocks}")
    print("\nsubset topology (get_subsets_in_block):")
    for s in model.get_subsets_in_block(0):
        print(f"  layers={s.layers} prev_op={s.prev_op} "
              f"input={s.input} inspect={s.inspect}")
    print("\nparams (top level + first blocks):")
    top = {k: v for k, v in model.params.items() if k != "blocks"}
    for ln in shape_tree(top):
        print(" ", ln)
    for i in range(min(args.blocks, model.num_blocks)):
        for ln in shape_tree(model.params["blocks"][i], f"blocks[{i}]"):
            print(" ", ln)


if __name__ == "__main__":
    main()
