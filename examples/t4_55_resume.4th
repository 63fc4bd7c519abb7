.( ## TPU extension demo: checkpoint + exact training resume ## ) cr
0 trace

.( ### a small classifier + synthetic batch ) cr
4 1 8 1 nn.model 16 linear relu 4 linear softmax constant cm
32 vector randn 4 1 8 1 reshape4 constant cx
16 vector{ 1 0 0 0  0 1 0 0  0 0 1 0  0 0 0 1 }
4 1 4 1 reshape4 constant chot
cm cx forward chot nn.onehot= drop
: cstep cm cx forward chot backprop 0.01 nn.adam drop ;

.( ### 6 adam steps, then checkpoint WITH optimizer state ) cr
6 1- for cstep next
cm s" /tmp/t4_55.ckpt" save drop
cm cx forward loss.ce ." loss at checkpoint = " . cr drop

.( ### continue 4 more steps on the original ) cr
4 1- for cstep next
cm cx forward loss.ce ." continuous run loss = " . cr drop

.( ### reload into a FRESH model: params + adam m/v + step counter ) cr
4 1 8 1 nn.model constant cr2
cr2 s" /tmp/t4_55.ckpt" load
cr2 cx forward chot nn.onehot= drop
: rstep cr2 cx forward chot backprop 0.01 nn.adam drop ;
4 1- for rstep next
cr2 cx forward loss.ce ." resumed run loss    = " . cr drop
.( ### (identical: the resume followed the exact same trajectory) ) cr

bye
