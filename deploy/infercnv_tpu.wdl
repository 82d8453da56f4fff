version 1.0
# WDL workflow wrapping the CLI (reference analogue: WDL/infercnv.wdl).
task infercnv_tpu {
  input {
    File raw_counts_matrix
    File annotations_file
    File gene_order_file
    String ref_group_names
    String additional_args = ""
    String docker = "infercnv_tpu:latest"
    Int preemptible = 2
    Int memory_gb = 64
  }
  command <<<
    python -m infercnv_tpu.cli \
      --raw_counts_matrix ~{raw_counts_matrix} \
      --annotations_file ~{annotations_file} \
      --gene_order_file ~{gene_order_file} \
      --ref_group_names "~{ref_group_names}" \
      --out_dir out ~{additional_args}
    tar -czf infercnv_tpu_outputs.tar.gz out
  >>>
  output {
    File outputs = "infercnv_tpu_outputs.tar.gz"
  }
  runtime {
    docker: docker
    memory: memory_gb + "G"
    preemptible: preemptible
  }
}
workflow run_infercnv_tpu {
  call infercnv_tpu
}
