"""Command-line drivers mirroring the reference's four entry scripts:

  python -m singlehdr_tpu.cli.train            (per-net pretraining; train.py)
  python -m singlehdr_tpu.cli.joint_train      (joint deq+lin+hal; joint_training.py)
  python -m singlehdr_tpu.cli.finetune         (HDR-Real finetune; finetune_real_dataset.py)
  python -m singlehdr_tpu.cli.infer            (inference; test_real_refinement.py)
  python -m singlehdr_tpu.cli.convert_records  (HDR-Real patching; convert_to_tf_record.py)
"""
