"""`aha train`: the fine-tuning entry point (reference `train.py` +
`scripts/train/*.sh` flag surface, `LiveTrainingArguments`
/root/reference/models/arguments_live.py:47-83)."""

from __future__ import annotations

import argparse

from aha_tpu.cli._session import _adopt_checkpoint_config


def cmd_train(argv):
    # multi-host bring-up FIRST: jax.distributed.initialize refuses to run
    # once any other call touches the backend (utils/dist.py), and model
    # build below does
    from aha_tpu.utils import dist as dist_utils

    dist_utils.maybe_init_distributed()

    from aha_tpu.config import AhaConfig, TrainConfig, aha_7b, aha_tiny, config_from_dict
    from aha_tpu.data.datasets import build_mixture_from_config
    from aha_tpu.models import aha
    from aha_tpu.train.trainer import train

    p = argparse.ArgumentParser(prog="aha train")
    p.add_argument("--model_preset", default="7b", choices=["7b", "tiny"])
    p.add_argument("--llm_pretrained", default=None)
    p.add_argument("--tokenizer_pretrained", default=None)
    p.add_argument("--dataset_config", required=True)
    p.add_argument("--output_dir", default="outputs/train")
    p.add_argument("--num_steps", type=int, default=None,
                   help="total MICRO-BATCH steps (one batch each; with "
                        "--grad_accum_steps G the optimizer updates every "
                        "G of them); alternatively --num_epochs")
    p.add_argument("--num_epochs", type=int, default=None,
                   help="epochs over the mixture (ref num_train_epochs); "
                        "converted to micro-batch steps as "
                        "len(dataset) // batch_size per epoch")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--learning_rate", type=float, default=2e-5)
    p.add_argument("--grad_accum_steps", type=int, default=2)
    p.add_argument("--mesh_data", type=int, default=-1)
    p.add_argument("--mesh_model", type=int, default=1)
    p.add_argument("--mesh_pipe", type=int, default=1,
                   help="GPipe pipeline stages over the decoder layers "
                        "(beyond-reference; parallel/pipeline.py)")
    p.add_argument("--pipe_microbatches", type=int, default=2)
    p.add_argument("--resume_from_checkpoint", default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--prefetch_batches", type=int, default=2,
                   help="batches decoded+collated ahead of the train step")
    p.add_argument("--decode_workers", type=int, default=2,
                   help="thread-pool workers for host video decode")
    p.add_argument("--video_head_stop_grad", action="store_true",
                   help="ablation: detach hidden states before the score "
                        "heads (ref video_head_live_llava_qwen.py:44-47)")
    p.add_argument("--remat_policy", default="full",
                   choices=["none", "full", "half", "dots", "dots_no_batch"],
                   help="trunk activation remat: 'full' = lowest HBM "
                        "(ref gradient_checkpointing), 'dots' saves matmul "
                        "outputs for a faster backward when memory allows")
    p.add_argument("--quantize_base", action="store_true",
                   help="QLoRA analog (ref NF4+LoRA): freeze the trunk as "
                        "int8, train bf16 adapters + dense finetune modules."
                        " Fits 7B LoRA fine-tuning on a single 16 GB chip.")
    p.add_argument("--quantize_bits", type=int, default=8, choices=[4, 8],
                   help="trunk quantization width for --quantize_base: 8 = "
                        "per-channel int8; 4 = group-wise packed int4 (the "
                        "ref NF4 analog, ~4.1 GiB trunk) — trainable via "
                        "the transposed fused-matmul VJP "
                        "(ops/pallas/fused_matmul.int4_qlinear)")
    p.add_argument("--lora_pretrained", default=None,
                   help="continue fine-tuning from a published peft adapter "
                        "dir (ref README continuation flow): adapters seed "
                        "the LoRA state, modules_to_save override the base")
    args = p.parse_args(argv)

    cfg = aha_tiny() if args.model_preset == "tiny" else aha_7b()
    cfg = _adopt_checkpoint_config(cfg, args.llm_pretrained)
    params, cfg, tokenizer = aha.build_model_and_tokenizer(
        cfg, tokenizer_pretrained=args.tokenizer_pretrained,
        weights_path=args.llm_pretrained,
    )
    if args.video_head_stop_grad:
        cfg = cfg.replace(video_head_stop_grad=True)
    lora_init = None
    if args.lora_pretrained:
        from aha_tpu.models import loader
        from aha_tpu.train.lora import lora_scale as _lscale

        lora_init, overrides, ad_scale = loader.load_adapter(
            args.lora_pretrained, cfg)
        params = loader.apply_overrides(params, overrides)
        if abs(ad_scale - _lscale(TrainConfig().lora)) > 1e-6:
            print(f"warning: adapter alpha/r scale {ad_scale} != training "
                  f"config scale {_lscale(TrainConfig().lora)} — adjust "
                  f"TrainConfig.lora to match the adapter")
    if args.quantize_base:
        from aha_tpu.ops.quant import quantize_params

        params = quantize_params(params, keep_dense=("projector", "lm_head"),
                                 bits=args.quantize_bits)
    train_cfg = TrainConfig(
        output_dir=args.output_dir,
        learning_rate=args.learning_rate,
        batch_size=args.batch_size,
        grad_accum_steps=args.grad_accum_steps,
        mesh_data=args.mesh_data,
        mesh_model=args.mesh_model,
        mesh_pipe=args.mesh_pipe,
        pipe_microbatches=args.pipe_microbatches,
        resume_from_checkpoint=args.resume_from_checkpoint,
        seed=args.seed,
        remat_policy=args.remat_policy,
    )
    dataset = build_mixture_from_config(args.dataset_config, tokenizer,
                                        system_prompt=train_cfg.system_prompt,
                                        frame_size=cfg.frame_resolution)
    num_steps = args.num_steps
    if num_steps is None:
        if args.num_epochs is None:
            p.error("one of --num_steps / --num_epochs is required")
        steps_per_epoch = max(len(dataset) // args.batch_size, 1)
        num_steps = args.num_epochs * steps_per_epoch

    # async input pipeline (SURVEY §7 hard part #5): thread-pool video
    # decode + prefetch ahead of the jitted step, so host decode overlaps
    # device compute instead of serializing with it
    import jax

    from aha_tpu.data.pipeline import batch_iterator
    from aha_tpu.parallel import mesh as mesh_lib

    m = mesh_lib.make_mesh(args.mesh_data, args.mesh_model, args.mesh_pipe)
    # multi-host data convention: when the data axis splits cleanly across
    # processes, each host decodes ONLY its own rows (batch_size/H local)
    # and the global batch is assembled per-host; otherwise fall back to
    # replicated loading (every host collates the identical full batch)
    n_proc = jax.process_count()
    per_host = (n_proc > 1 and args.batch_size % n_proc == 0
                and mesh_lib.data_axis_spans_processes(m))
    loader_bs = args.batch_size // n_proc if per_host else args.batch_size
    if n_proc > 1 and not per_host:
        print(f"multi-host replicated loading: batch {args.batch_size} or "
              f"mesh layout not splittable over {n_proc} processes — every "
              f"host decodes the full batch")
    batches = batch_iterator(
        dataset, tokenizer,
        batch_size=loader_bs,
        v_placeholder_id=cfg.v_placeholder_id,
        frame_num_tokens=cfg.frame_num_tokens,
        seed=args.seed,
        prefetch=args.prefetch_batches,
        num_workers=args.decode_workers,
        shard_across_hosts=per_host,
    )
    train(cfg, train_cfg, params, batches, total_steps=num_steps,
          device_mesh=m, lora_init=lora_init, use_wandb=args.wandb,
          per_host_batches=per_host)
